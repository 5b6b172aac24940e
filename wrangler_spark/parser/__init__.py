from wrangler_spark.parser.tokens import Token, TokenType
from wrangler_spark.parser.recipe_parser import DirectiveCall, parse_recipe

__all__ = ["Token", "TokenType", "DirectiveCall", "parse_recipe"]
