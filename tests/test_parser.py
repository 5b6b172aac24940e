"""Recipe tokenizer/parser tests (mirrors reference GrammarBasedParserTest
/ RecipeCompilerTest patterns)."""

import pytest

from wrangler_spark.errors import RecipeSyntaxError
from wrangler_spark.parser import TokenType, parse_recipe
from wrangler_spark.parser.tokenizer import tokenize_statement


def test_simple_directive():
    toks = tokenize_statement("uppercase :name")
    assert toks[0].type is TokenType.DIRECTIVE_NAME and toks[0].value == "uppercase"
    assert toks[1].type is TokenType.COLUMN and toks[1].value == "name"


def test_text_and_bool():
    toks = tokenize_statement("parse-as-csv :body ',' true")
    assert [t.type for t in toks] == [
        TokenType.DIRECTIVE_NAME,
        TokenType.COLUMN,
        TokenType.TEXT,
        TokenType.BOOL,
    ]
    assert toks[2].value == ","


def test_column_list():
    toks = tokenize_statement("drop :a,:b,:c")
    assert toks[1].type is TokenType.COLUMN_LIST
    assert toks[1].value == ["a", "b", "c"]


def test_numeric_and_list():
    toks = tokenize_statement("parse-as-fixed-length :rec 2,4,5,3 '_'")
    assert toks[2].type is TokenType.NUMERIC_LIST
    assert toks[2].value == [2, 4, 5, 3]
    toks = tokenize_statement("parse-as-json :doc 2")
    assert toks[2].type is TokenType.NUMERIC and toks[2].value == 2


def test_expression_block():
    toks = tokenize_statement("filter-row exp:{ age > 10 && name =~ 'a.*' } true")
    assert toks[1].type is TokenType.EXPRESSION
    assert "age > 10" in toks[1].value
    assert toks[2].type is TokenType.BOOL


def test_expression_with_brace_in_string():
    toks = tokenize_statement("set-column :x exp:{ a == '}' ? 1 : 2 }")
    assert toks[2].type is TokenType.EXPRESSION
    assert toks[2].value == "a == '}' ? 1 : 2"


def test_ranges():
    toks = tokenize_statement("quantize :hrlywage :wagerange 0.0:20.0=LOW,21.0:75.0=MEDIUM")
    assert toks[3].type is TokenType.RANGES
    assert toks[3].value[0] == (0.0, 20.0, "LOW")
    assert toks[3].value[1] == (21.0, 75.0, "MEDIUM")


def test_properties():
    toks = tokenize_statement("some-directive prop:{k1=1, k2='v', k3=true}")
    assert toks[1].type is TokenType.PROPERTIES
    assert toks[1].value == {"k1": 1, "k2": "v", "k3": True}


def test_recipe_split_and_pragma():
    r = parse_recipe(
        """
        #pragma version 2.0
        parse-as-csv :body ',' false; drop :body
        uppercase :name // trailing comment
        """
    )
    assert [c.name for c in r.calls] == ["parse-as-csv", "drop", "uppercase"]
    assert r.pragmas["version"] == ["2.0"]


def test_bad_statement_raises():
    with pytest.raises(RecipeSyntaxError):
        parse_recipe("uppercase :name 'unterminated")
