"""Expression-language golden tests, mirroring the reference's
functions/*Test.java style: evaluate exp:{...} via set-column on a
one-row frame and assert exact values."""

import pytest

from pyspark.sql import functions as F

from wrangler_spark import Pipeline
from wrangler_spark.errors import ExpressionError


@pytest.fixture(scope="module")
def one(spark):
    return spark.createDataFrame(
        [("hello world", 7, -3.5, None, "2024-03-15 10:30:45")],
        "s string, i int, d double, n string, ts_str string",
    )


def ev(one, expr):
    out = Pipeline.compile(f"set-column :res exp:{{ {expr} }}").apply(one)
    return out.collect()[0]["res"]


# --- operators --------------------------------------------------------------

def test_arithmetic(one):
    assert ev(one, "1 + 2 * 3") == 7
    assert ev(one, "(1 + 2) * 3") == 9
    assert ev(one, "7 / 2") == 3            # int/int: Java integral division
    assert ev(one, "7.0 / 2") == 3.5
    assert ev(one, "i % 4") == 3
    assert ev(one, "-d") == 3.5


def test_string_concat_plus(one):
    assert ev(one, "s + '!'") == "hello world!"
    assert ev(one, "'n=' + i") == "n=7"


def test_comparisons_and_logic(one):
    assert ev(one, "i > 5 && d < 0") is True
    assert ev(one, "i < 5 || d < 0") is True
    assert ev(one, "!(i == 7)") is False
    assert ev(one, "i >= 7 ? 'big' : 'small'") == "big"


def test_match_operators(one):
    assert ev(one, "s =~ 'hello.*'") is True
    assert ev(one, "s =~ 'hello'") is False      # full-anchored like String.matches
    assert ev(one, "s !~ 'xyz.*'") is True
    assert ev(one, "s =^ 'hello'") is True
    assert ev(one, "s =$ 'world'") is True


def test_null_semantics(one):
    assert ev(one, "n") is None
    assert ev(one, "missing_column") is None     # EL null-fills unbound vars
    assert ev(one, "IsNull(n)") is True
    assert ev(one, "IsNotNull(s)") is True
    assert ev(one, "NullToValue(n, 'x')") == "x"
    assert ev(one, "NullToEmpty(n)") == ""
    assert ev(one, "n ?: 'fallback'") == "fallback"


# --- namespaces -------------------------------------------------------------

def test_global_fns(one):
    assert ev(one, "toDouble('3.25')") == 3.25
    assert ev(one, "toInteger('42')") == 42
    assert ev(one, "concat(s, '!')") == "hello world!"
    assert ev(one, "concat('a', '-', 'b')") == "a-b"
    assert ev(one, "coalesce(n, s)") == "hello world"
    assert ev(one, "format('%03d', i)") == "007"
    assert ev(one, "padAtStart('7', 3, '0')") == "007"
    assert ev(one, "repeat('ab', 3)") == "ababab"
    assert ev(one, "unquote('\"q\"')") == "q"


def test_math_fns(one):
    assert ev(one, "math:abs(d)") == 3.5
    assert ev(one, "math:ceil(d)") == -3.0
    assert ev(one, "math:floor(3.7)") == 3
    assert ev(one, "math:pow(2.0, 10.0)") == 1024.0
    assert ev(one, "math:max(i, 10)") == 10
    assert ev(one, "math:sqrt(16.0)") == 4.0
    assert ev(one, "math:round(3.5)") == 4


def test_string_fns(one):
    assert ev(one, "string:substring(s, 6)") == "world"
    assert ev(one, "string:substring(s, 0, 5)") == "hello"
    assert ev(one, "string:substring(s, -5)") == "world"       # commons negative index
    assert ev(one, "string:upperCase(s)") == "HELLO WORLD"
    assert ev(one, "string:capitalize(s)") == "Hello world"
    assert ev(one, "string:reverse('abc')") == "cba"
    assert ev(one, "string:isEmpty('')") is True
    assert ev(one, "string:left(s, 5)") == "hello"
    assert ev(one, "string:right(s, 5)") == "world"
    assert ev(one, "string:contains(s, 'wor')") is True
    assert ev(one, "string:indexOf(s, 'world')") == 6
    assert ev(one, "string:replace(s, 'world', 'there')") == "hello there"
    assert ev(one, "string:countMatches('abcabc', 'bc')") == 2
    assert ev(one, "string:substringAfter(s, 'hello ')") == "world"
    assert ev(one, "string:substringBefore(s, ' world')") == "hello"
    assert ev(one, "string:swapCase('aBc')") == "AbC"
    assert ev(one, "string:getLevenshteinDistance('kitten', 'sitting')") == 3


def test_string_fns_lang3_tail(one):
    # goldens follow commons-lang3 StringUtils javadoc examples
    assert ev(one, "string:equalsIgnoreCase('abc', 'ABC')") is True
    assert ev(one, "string:equals('abc', 'abd')") is False
    assert ev(one, "string:containsIgnoreCase(s, 'WORLD')") is True
    assert ev(one, "string:indexOfIgnoreCase(s, 'WORLD')") == 6
    assert ev(one, "string:lastIndexOf('aabaabaa', 'ab')") == 4
    assert ev(one, "string:lastIndexOf('aabaabaa', 'zz')") == -1
    assert ev(one, "string:substringAfterLast('a.b.c', '.')") == "c"
    assert ev(one, "string:substringAfterLast('abc', '.')") == ""
    assert ev(one, "string:substringBeforeLast('a.b.c', '.')") == "a.b"
    assert ev(one, "string:substringBeforeLast('abc', '.')") == "abc"
    assert ev(one, "string:isAlpha('abc')") is True
    assert ev(one, "string:isAlpha('ab2c')") is False
    assert ev(one, "string:isAlpha('')") is False
    assert ev(one, "string:isNumeric('123')") is True
    assert ev(one, "string:isNumeric('12 3')") is False
    assert ev(one, "string:isNumeric('12.3')") is False
    assert ev(one, "string:isAlphanumeric('ab2c')") is True
    assert ev(one, "string:isAlphaSpace('ab c')") is True
    assert ev(one, "string:isAlphaSpace('')") is True
    assert ev(one, "string:isNumericSpace('12 3')") is True
    assert ev(one, "string:isWhitespace('   ')") is True
    assert ev(one, "string:isAllUpperCase('ABC')") is True
    assert ev(one, "string:isAllUpperCase('aBC')") is False
    assert ev(one, "string:isAllLowerCase('abc')") is True
    assert ev(one, "string:stripStart('yxabcxy', 'xyz')") == "abcxy"
    assert ev(one, "string:stripEnd('yxabcxy', 'xyz')") == "yxabc"
    assert ev(one, "string:stripToNull('   ')") is None
    assert ev(one, "string:stripToEmpty('  ab  ')") == "ab"
    assert ev(one, "string:normalizeSpace('  a   b  c ')") == "a b c"
    assert ev(one, "string:getDigits('(541) 754-3010')") == "5417543010"
    assert ev(one, "string:overlay('abcdef', 'zzzz', 2, 4)") == "abzzzzef"
    assert ev(one, "string:overlay('abcdef', 'zzzz', 4, 2)") == "abzzzzef"
    assert ev(one, "string:overlay('abcdef', 'zzzz', -1, 4)") == "zzzzef"
    assert ev(one, "string:replaceOnce('aba', 'a', 'z')") == "zba"
    assert ev(one, "string:replaceIgnoreCase('FoOFoofoo', 'foo', '#')") == "###"
    assert ev(one, "string:removeIgnoreCase('quEUed', 'ue')") == "qd"
    assert ev(one, "string:containsAny('zzabyycdxx', 'za')") is True
    assert ev(one, "string:containsAny('zzabyycdxx', 'q')") is False
    assert ev(one, "string:containsNone('abab', 'xyz')") is True
    assert ev(one, "string:containsOnly('abab', 'abc')") is True
    assert ev(one, "string:containsOnly('ab1', 'abc')") is False
    assert ev(one, "string:abbreviateMiddle('abcdef', '.', 4)") == "ab.f"
    assert ev(one, "string:abbreviateMiddle('abc', '.', 3)") == "abc"


def test_date_fns(one):
    assert ev(one, "date:YEAR(toDate(ts_str))".replace("toDate(ts_str)", "datetime:GetDateTime(ts_str)")) == 2024
    assert ev(one, "date:MONTH(datetime:GetDateTime(ts_str))") == 3
    assert ev(one, "date:DAY_OF_WEEK(datetime:GetDateTime(ts_str))") == 6  # Friday
    assert ev(one, "date:SECONDS_TO_MINUTES(3600)") == 60


def test_dq_fns(one):
    assert ev(one, "dq:isEmail('a@b.com')") is True
    assert ev(one, "dq:isEmail('nope')") is False
    assert ev(one, "dq:isIPv4('192.168.0.1')") is True
    assert ev(one, "dq:isIPv4('999.1.1.1')") is False
    assert ev(one, "dq:isUrl('https://x.org/a')") is True
    assert ev(one, "dq:strlen(s)") == 11
    assert ev(one, "dq:inrange(i, 0, 10)") is True
    assert ev(one, "dq:isNumber('3.14')") is True
    # Luhn: a valid Visa test number vs an invalid one
    assert ev(one, "dq:isCreditCard('4111111111111111')") is True
    assert ev(one, "dq:isCreditCard('4111111111111112')") is False
    assert ev(one, "dq:isISBN10('0306406152')") is True
    assert ev(one, "dq:isISBN13('9780306406157')") is True


def test_json_and_logical(one):
    assert ev(one, "json:select('{\"a\": {\"b\": 5}}', '$.a.b')") == "5"
    assert ev(one, "json:ArrayLength('[1,2,3]')") == 3
    assert ev(one, "json:IsObject('{\"x\":1}')") is True
    assert ev(one, "logical:BitAnd(12, 10)") == 8
    assert ev(one, "logical:BitOr(12, 10)") == 14
    assert ev(one, "logical:BitXor(12, 10)") == 6
    assert ev(one, "logical:Not(0)") == 1


def test_number_fns(one):
    assert ev(one, "number:AsDouble(i)") == 7.0
    assert ev(one, "number:Mantissa(3.75)") == 0.75


def test_unknown_function_raises(one):
    with pytest.raises(ExpressionError, match="unknown EL function"):
        ev(one, "string:noSuchFn(s)")
    with pytest.raises(ExpressionError, match="unknown EL namespace"):
        ev(one, "nope:fn(s)")


def test_field_and_index_access(spark):
    df = spark.createDataFrame(
        [(("a", 5), [10, 20, 30])], "st struct<x: string, y: int>, arr array<int>"
    )
    p = Pipeline.compile("set-column :r1 exp:{ st.y + arr[1] }")
    assert p.apply(df).collect()[0]["r1"] == 25


def test_geo_in_fence(one):
    fence = '{"type": "Polygon", "coordinates": [[[-122.5, 37.6], [-122.3, 37.6], [-122.3, 37.9], [-122.5, 37.9], [-122.5, 37.6]]]}'
    fence_esc = fence.replace('"', '\\"')
    # SF (37.77, -122.42) inside; NYC (40.71, -74.0) outside
    assert ev(one, f'geo:inFence(37.77, -122.42, "{fence_esc}")') is True
    assert ev(one, f'geo:inFence(40.71, -74.0, "{fence_esc}")') is False


def test_escape_fns(one):
    assert ev(one, "escape:escapeCsv('a,b')") == '"a,b"'
    assert ev(one, "escape:escapeCsv('plain')") == "plain"
    assert ev(one, "escape:unescapeCsv('\"a,b\"')") == "a,b"
    assert ev(one, "escape:escapeHtml4('a < b & c')") == "a &lt; b &amp; c"
    assert ev(one, "escape:escapeJson(s)") == "hello world"


def test_more_string_fns(one):
    assert ev(one, "string:removeStart('prefix_x', 'prefix_')") == "x"
    assert ev(one, "string:removeEnd('x_suffix', '_suffix')") == "x"
    assert ev(one, "string:prependIfMissing('x.txt', 'dir/')") == "dir/x.txt"
    assert ev(one, "string:appendIfMissing('file', '.txt')") == "file.txt"
    assert ev(one, "string:wrap('x', '\"')") == '"x"'
    assert ev(one, "string:unwrap('\"x\"', '\"')") == "x"
    assert ev(one, "string:truncate(s, 5)") == "hello"
    assert ev(one, "string:center('ab', 6, '*')") == "**ab**"
    assert ev(one, "string:rotate('abcdef', 2)") == "efabcd"
    assert ev(one, "string:initials(s)") == "hw"


def test_dq_meta_fns(one):
    assert ev(one, "dq:columns(row)") == 5
    assert ev(one, "dq:hascolumn(row, 's')") is True
    assert ev(one, "dq:hascolumn(row, 'nope')") is False


def test_json_drop_and_keys(one):
    assert ev(one, "json:drop('{\"a\":1,\"b\":2}', 'b')") == '{"a":"1"}'
    assert ev(one, "json:keysToLower('{\"Foo\":1}')") == '{"foo":"1"}'


def test_arithmetic_decimal_ddl(spark):
    df = spark.createDataFrame([((5, "x"), 12, 8)], "st struct<a:int,b:string>, m int, n int")
    p = Pipeline.compile(
        "set-column :s exp:{ arithmetic:add(m, n) }\n"
        "set-column :q exp:{ arithmetic:divider(m, n) }\n"
        "set-column :g exp:{ arithmetic:lcm(m, n) }\n"
        "set-column :sel exp:{ ddl:select(st, 'a') }\n"
        "set-column :dropped exp:{ ddl:json(ddl:drop(st, 'b')) }"
    )
    r = p.apply(df).collect()[0]
    assert r["s"] == 20 and r["q"] == 4
    assert r["g"] == 24  # lcm(12, 8)
    assert r["sel"] == 5
    assert r["dropped"] == '{"a":5}'


def test_decimal_fns(spark):
    df = spark.createDataFrame([("123.45",)], ["x"])
    p = Pipeline.compile(
        "set-type :x decimal 2\n"
        "set-column :p exp:{ decimal:precision(x) }\n"
        "set-column :sc exp:{ decimal:scale(x) }\n"
        "set-column :u exp:{ decimal:unscaled(x) }"
    )
    r = p.apply(df).collect()[0]
    assert r["p"] == 5 and r["sc"] == 2 and r["u"] == 12345


def test_geo_in_fence_reference_goldens(one):
    """The reference's GeoFenceTest cases verbatim (GeoFenceTest.java:28-66):
    FeatureCollection fences (multi + single), the exact in/out points, and
    the open-polygon rejection."""
    multi = (
        '{"type":"FeatureCollection","features":[{"type":"Feature","properties":{},'
        '"geometry":{"type":"Polygon","coordinates":[[[-122.05870628356934,37.37943348292772],'
        '[-122.05724716186525,37.374727268782294],[-122.04634666442871,37.37493189292912],'
        '[-122.04608917236328,37.38175237839049],[-122.05870628356934,37.37943348292772]]]}},'
        '{"type":"Feature","properties":{},"geometry":{"type":"Polygon","coordinates":'
        '[[[-122.05055236816405,37.36862239166385],[-122.04038143157959,37.36841775030572],'
        '[-122.04141139984132,37.37312436031927],[-122.05055236816405,37.36862239166385]]]}}]}'
    )
    single = (
        '{"type":"FeatureCollection","features":[{"type":"Feature","properties":{},'
        '"geometry":{"type":"Polygon","coordinates":[[[-122.05870628356934,37.37943348292772],'
        '[-122.05724716186525,37.374727268782294],[-122.04634666442871,37.37493189292912],'
        '[-122.04608917236328,37.38175237839049],[-122.05870628356934,37.37943348292772]]]}}]}'
    )
    for fence in (multi, single):
        esc = fence.replace('"', '\\"')
        assert ev(one, f'geo:inFence(37.378990156513105, -122.05076694488525, "{esc}")') is True
        assert ev(one, f'geo:inFence(43.46089378008257, -462.49145507812494, "{esc}")') is False

    open_poly = (
        '{"type":"FeatureCollection","features":[{"type":"Feature","properties":{},'
        '"geometry":{"type":"Polygon","coordinates":[[[-122.05870628356934,37.37943348292772],'
        '[-122.05724716186525,37.374727268782294],[-122.04634666442871,37.37493189292912],'
        '[-122.04608917236328,37.38175237839049]]]}}]}'
    )
    esc = open_poly.replace('"', '\\"')
    import pytest as _pt

    from wrangler_spark.errors import WranglerError

    with _pt.raises(Exception):
        ev(one, f'geo:inFence(43.46089378008257, -462.49145507812494, "{esc}")')
