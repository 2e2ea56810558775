from velox_tpu.tpch.queries import tpch_plan  # noqa: F401
