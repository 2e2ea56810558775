from velox_tpu.parse.parser import parse_expression  # noqa: F401
