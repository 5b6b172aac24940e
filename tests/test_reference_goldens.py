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


# --- DateAndTimeTest.java --------------------------------------------------

def test_datetime_date_from_days_since(spark):
    # DateAndTimeTest.java:60-68
    r = _run1(
        spark,
        "set-column d1 datetime:DateFromDaysSince(18250, datetime:GetDate('1958-08-18'))\n"
        "set-column d2 datetime:DateFromDaysSince(-1, datetime:GetDate('1958-08-18'))",
        [(1,)],
        "x int",
    )
    assert str(r["d1"]) == "2008-08-05" and str(r["d2"]) == "1958-08-17"


def test_datetime_date_from_components(spark):
    # DateAndTimeTest.java:74-84
    r = _run1(
        spark,
        "set-column d1 datetime:DateFromComponents(2010, 12, 2)\n"
        "set-column d2 datetime:DateFromComponents(1958, 8, 18)",
        [(1,)],
        "x int",
    )
    assert str(r["d1"]) == "2010-12-02" and str(r["d2"]) == "1958-08-18"


def test_datetime_julian_and_spans(spark):
    # DateAndTimeTest.java:90-99, 149-181
    r = _run1(
        spark,
        "set-column jd datetime:DateFromJulianDay(2454614L)\n"
        "set-column dim datetime:DaysInMonth(datetime:GetDate('1958-08-18'))\n"
        "set-column diy1 datetime:DaysInYear(datetime:GetDate('2012-08-18'))\n"
        "set-column diy2 datetime:DaysInYear(datetime:GetDate('2011-08-18'))",
        [(1,)],
        "x int",
    )
    assert str(r["jd"])[:10] == "2008-05-27"
    assert r["dim"] == 31 and r["diy1"] == 366 and r["diy2"] == 365


def test_datetime_days_since_from_date(spark):
    # DateAndTimeTest.java:121-143
    r = _run1(
        spark,
        "set-column n1 datetime:DaysSinceFromDate(datetime:GetDate('2008-08-18'), datetime:GetDate('1958-08-18'))\n"
        "set-column n2 datetime:DaysSinceFromDate(datetime:GetDate('1958-08-18'), datetime:GetDate('2008-08-18'))",
        [(1,)],
        "x int",
    )
    assert r["n1"] == -18263 and r["n2"] == 18263


# --- JEXL script forms (GlobalTest.java:104-120, NumberFunctionsTest.java:35-58)

def test_if_else_expression(spark):
    r = _run1(
        spark,
        "set-column test4 if(IsNotNull(c)){ a } else {b}",
        [("va", "vb", "vc")],
        "a string, b string, c string",
    )
    assert r["test4"] == "va"
    r2 = _run1(
        spark,
        "set-column test4 if(IsNotNull(c)){ a } else {b}",
        [("va", "vb", None)],
        "a string, b string, c string",
    )
    assert r2["test4"] == "vb"


def test_script_block_locals(spark):
    # local assignments shadow columns for the rest of the script
    r = _run1(
        spark,
        "set-column d { a = 5.0; number:AsDouble(a/2) }\n"
        "set-column i { a = 5.64; number:AsInteger(a) }\n"
        "set-column m { a = 43.2534; number:Mantissa(a) }",
        [(99.0,)],
        "a double",
    )
    assert r["d"] == 2.5
    assert r["i"] == 5
    assert math.isclose(r["m"], 0.2534, abs_tol=1e-9)


# --- ExpressionTest.java:55-80 (the reference's flagship expression test) --

def test_apply_expr_end_to_end(spark):
    recipe = [
        "parse-as-csv __col ,",
        "drop __col",
        "set columns id,first,last,dob,email,age,hrlywage,address,city,state,country,zip",
        'set column name concat(last, ", ", first)',
        "set column isteen age < 15 ? 'yes' : 'no'",
        "set column salary hrlywage*40*4",
        "drop first",
        "drop last",
        "set column email string:reverse(email)",
        "set column hrlywage var x; x = math:ceil(toFloat(hrlywage)); x + 1",
    ]
    df = spark.createDataFrame(
        [("1098,Root,Joltie,01/26/1956,root@jolite.io,32,11.79,150 Mars Ave,Palo Alto,CA,USA,32826",)],
        "__col string",
    )
    r = Pipeline.compile(recipe).apply(df).collect()[0]
    assert r["name"] == "Joltie, Root"          # ExpressionTest.java:76
    assert r["salary"] == 1886.3999999999999    # :77 (same double artifacts)
    assert r["isteen"] == "no"                  # :78
    assert r["email"] == "oi.etiloj@toor"       # :79
    assert r["hrlywage"] == 13.0                # :80


def test_string_namespace_goldens(spark):
    # ExpressionTest.java:101-125
    r = _run1(
        spark,
        "set column abbreviate string:abbreviate(longtxt, 5)\n"
        "set column eoltxt string:chomp(eoltxt)\n"
        "set column chop string:chop(chop)\n"
        "set column delws string:deleteWhitespace(delws)",
        [("This is long transformation", "This has eol\n", "Joltie", "Jolti  Root")],
        "longtxt string, eoltxt string, chop string, delws string",
    )
    assert r["abbreviate"] == "Th..."           # :125
    assert r["eoltxt"] == "This has eol"        # :124
    assert r["chop"] == "Jolti"                 # :122
    assert r["delws"] == "JoltiRoot"            # :123


# --- DDLTest.java:71-94 (path selection over nested records) ---------------

def test_ddl_select_paths(spark):
    df = spark.createDataFrame(
        [((("str1", 3), ["a", "b", "c"], {"rec2": "v2"}),)],
        "rec struct<rec1:struct<s:string,l:bigint>, a:array<string>, m:map<string,string>>",
    )
    r = Pipeline.compile(
        "set-column s0 ddl:select(rec, 'rec1.s')\n"
        "set-column l0 ddl:select(rec, 'rec1.l')\n"
        "set-column a0 ddl:select(rec, 'a[0]')\n"
        "set-column a2 ddl:select(rec, 'a[2]')\n"
        "set-column m0 ddl:select(rec, 'm[rec2]')",
        registry=None,
    ).apply(df).collect()[0]
    assert r["s0"] == "str1"    # DDLTest.java:91
    assert r["l0"] == 3         # :94
    assert r["a0"] == "a"       # :86
    assert r["a2"] == "c"       # :88
    assert r["m0"] == "v2"      # :82-83


# --- ExpressionTest.java:148-190 (date: namespace) --------------------------

def test_date_namespace_goldens(spark):
    recipe = [
        "parse-as-simple-date date yyyy-MM-dd'T'HH:mm:ss",
        "parse-as-simple-date other yyyy-MM-dd'T'HH:mm:ss",
        "set-column unixtimestamp date:UNIXTIMESTAMP_MILLIS(date)",
        "set-column month_no date:MONTH(date)",
        "set-column month_short date:MONTH_SHORT(date)",
        "set-column month_long date:MONTH_LONG(date)",
        "set-column year date:YEAR(date)",
        "set-column day_of_year date:DAY_OF_YEAR(date)",
        "set-column days date:SECONDS_TO_DAYS(seconds)",
        "set-column hours date:SECONDS_TO_HOURS(seconds)",
        "set-column diff date:DAYS_BETWEEN(date, other)",
    ]
    df = spark.createDataFrame(
        [("2017-02-02T21:06:44Z", 86401, "2017-02-03T21:06:44Z")],
        "date string, seconds int, other string",
    )
    r = Pipeline.compile(recipe).apply(df).collect()[0]
    assert r["unixtimestamp"] == 1486069604000   # ExpressionTest.java:180
    assert r["month_no"] == 2                    # :181
    assert r["month_short"] == "Feb"             # :182
    assert r["month_long"] == "February"         # :183
    assert r["year"] == 2017                     # :184
    assert r["day_of_year"] == 33                # :185
    assert r["days"] == 1                        # :187
    assert r["hours"] == 24                      # :188
    assert abs(r["diff"]) == 1                   # :189


# --- JsonFunctionsTest.java:95-112 (IsValid + if-expression) ----------------

def test_json_isvalid(spark):
    malformed = '{ "a" : 1, "b" : 2.0, "c" : "test" "d" : true }'  # missing comma
    basic = '{ "a" : 1, "b" : 2.0, "c" : "test", "d" : true }'
    df = spark.createDataFrame([(malformed, basic)], "malformed string, basic string")
    r = Pipeline.compile(
        "set-column baddata if(json:IsValid(malformed)) { malformed } else { 'Invalid Json' }\n"
        "set-column badjson json:IsValid(malformed)\n"
        "set-column goodjson json:IsValid(basic)"
    ).apply(df).collect()[0]
    assert r["baddata"] == "Invalid Json"   # JsonFunctionsTest.java:109
    assert r["badjson"] is False            # :110
    assert r["goodjson"] is True            # :111


# --- JsonFunctionsTest.java:65-87 (wildcard JsonPath selection) -------------

def test_jsonpath_wildcard_select(spark):
    import json

    doc = json.dumps({
        "list": [
            {"set": {"first": {"a1": "b1"}, "second": {"x1": "y1"}}},
            {"set": {"first": {"a2": "b2"}, "second": {"x2": "y2"}}},
            {"set": {"first": {"a3": "b3"}, "second": {"x3": "y3"}}},
        ]
    })
    df = spark.createDataFrame([(doc,)], "body string")
    out = Pipeline.compile("json-path :body :entries '$.list[*].set.*'").apply(df)
    entries = json.loads(out.collect()[0]["entries"])
    assert entries == [
        {"a1": "b1"}, {"x1": "y1"},
        {"a2": "b2"}, {"x2": "y2"},
        {"a3": "b3"}, {"x3": "y3"},
    ]  # JsonFunctionsTest.java:78-86 ordering and values


def test_jsonpath_recursive_descent(spark):
    df = spark.createDataFrame(
        [('{"a": {"deep": 1, "b": {"deep": 2}}, "c": [{"deep": 3}]}',)], "body string"
    )
    out = Pipeline.compile("json-path :body :found '$..deep'").apply(df)
    import json
    assert sorted(json.loads(out.collect()[0]["found"])) == [1, 2, 3]
