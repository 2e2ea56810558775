from velox_tpu.core import expressions  # noqa: F401
