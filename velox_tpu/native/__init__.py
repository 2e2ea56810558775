from velox_tpu.native.build import load_native  # noqa: F401
