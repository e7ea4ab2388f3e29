from tlab_tpu.fdm.plan import DerivPlan, FdmPlan, build_fdm_plan  # noqa: F401
