from velox_tpu.exec.task import QueryCtx, Task  # noqa: F401
