from tlab_tpu.physics.params import NSParams  # noqa: F401
