from tlab_tpu.io.fields_io import read_field, write_field  # noqa: F401
