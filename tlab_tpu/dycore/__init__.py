from tlab_tpu.dycore.state import State  # noqa: F401
