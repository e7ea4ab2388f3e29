from tlab_tpu.parallel.mesh import make_mesh, field_sharding, gspmd_shardings  # noqa: F401
