from wrangler_spark.expression.translator import (
    compile_condition,
    compile_expression,
    cond_not_true,
    cond_true,
)

__all__ = ["compile_expression", "compile_condition", "cond_true", "cond_not_true"]
