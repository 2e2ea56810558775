from velox_tpu.testing.plan_builder import PlanBuilder  # noqa: F401
