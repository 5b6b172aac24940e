"""Golden cases lifted from the reference's own function tests —
the same recipes (V1 syntax, exercising MigrateToV2 parity) with the
same expected values. Sources:

- wrangler-core/src/test/java/io/cdap/functions/GlobalTest.java
- wrangler-core/src/test/java/io/cdap/functions/LogicalTest.java:32-61
- wrangler-core/src/test/java/io/cdap/functions/NumberFunctionsTest.java:35-58
"""

import math

import pytest

from wrangler_spark import Pipeline


def _run1(spark, recipe, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return Pipeline.compile(recipe).apply(df).collect()[0]


# --- GlobalTest.java -------------------------------------------------------

@pytest.mark.parametrize(
    "a,b,c,expect",
    [
        (None, None, "c", "c"),    # testFirstNonNullFound (GlobalTest.java:34-45)
        (None, None, None, None),  # testFirstNonNullNotFound (:47-59)
        ("a", None, "c", "a"),     # testFirstNonNullFoundInBetween (:61-73)
        ("a", None, None, "a"),    # testFirstNonNullFoundAtStart (:75-87)
    ],
)
def test_global_coalesce(spark, a, b, c, expect):
    r = _run1(spark, "set-column d coalesce(a,b,c)", [(a, b, c)], "a string, b string, c string")
    assert r["d"] == expect


def test_global_format(spark):
    # testPrint (GlobalTest.java:89-101)
    r = _run1(spark, 'set-column d format("%s-%s-%s", a,b,c)', [("a", "b", "c")], "a string, b string, c string")
    assert r["d"] == "a-b-c"


def test_global_isnotnull_ternary(spark):
    # testIsNotNull (GlobalTest.java:104-120)
    r = _run1(
        spark,
        "set-column test1 IsNotNull(a) ? a : null\nset-column test2 IsNotNull(b) ? b : null",
        [("value", None)],
        "a string, b string",
    )
    assert r["test1"] == "value" and r["test2"] is None


# --- LogicalTest.java:32-61 ------------------------------------------------

def test_logical_bit_ops(spark):
    r = _run1(
        spark,
        "set-column b_and logical:BitAnd(352, 400)\n"
        "set-column b_or logical:BitOr(352, 400)\n"
        "set-column b_xor logical:BitXor(352, 400)\n"
        "set-column compress logical:BitCompress('0101100000')\n"
        "set-column expand logical:BitExpand(352)\n"
        "set-column not1 logical:Not(5-5)\n"
        "set-column not2 logical:Not(5+5)\n",
        [(1,)],
        "x int",
    )
    assert r["b_and"] == 256       # LogicalTest.java:50
    assert r["b_or"] == 496        # :51
    assert r["b_xor"] == 240       # :52
    assert r["compress"] == 352    # :56
    assert r["expand"] == "101100000"  # :57
    assert r["not1"] == 1          # :58
    assert r["not2"] == 0          # :59


def test_logical_setbit(spark):
    r = _run1(
        spark,
        "set-column bitset logical:SetBit(356, [2,4,8], 1)\n"
        "set-column bitclear logical:SetBit(494, [2,4,8], 0)\n"
        "set-column not3 logical:Not(null)",
        [(1,)],
        "x int",
    )
    assert r["bitset"] == 494      # LogicalTest.java:61
    assert r["bitclear"] == 356    # inverse of the same positions
    assert r["not3"] == 1          # LogicalTest.java:60 (null → false → 1)


# --- NumberFunctionsTest.java:35-58 ---------------------------------------

def test_number_casts_and_mantissa(spark):
    r = _run1(
        spark,
        "set-column d1 number:AsDouble(5.0/2)\n"
        "set-column f1 number:AsFloat(2.34)\n"
        "set-column i1 number:AsInteger(5.64)\n"
        "set-column m1 number:Mantissa(5)\n"
        "set-column m2 number:Mantissa(43.2534)\n",
        [(1,)],
        "x int",
    )
    assert r["d1"] == 2.5                               # NumberFunctionsTest.java:51
    assert abs(r["f1"] - 2.34) < 1e-6                   # :52
    assert r["i1"] == 5                                 # :53 (truncation, not rounding)
    assert r["m1"] == 0.0                               # :54
    assert math.isclose(r["m2"], 0.2534, abs_tol=1e-9)  # :55
