from velox_tpu.expression.eval import (  # noqa: F401
    EvalValue, ExprSet, compile_exprs, evaluate,
)
