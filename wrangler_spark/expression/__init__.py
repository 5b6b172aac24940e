from wrangler_spark.expression.translator import compile_expression, compile_condition

__all__ = ["compile_expression", "compile_condition"]
