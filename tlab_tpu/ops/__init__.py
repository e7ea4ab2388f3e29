from tlab_tpu.ops.derivative import apply_along, der1, der2, der12  # noqa: F401
