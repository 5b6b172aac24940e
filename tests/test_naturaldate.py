"""parse-as-date natural-language fallback (natty parity shapes,
ref: parser/ParseDate.java:103-112, ParseDateTest.testDateParser)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

from wrangler_spark import Pipeline
from wrangler_spark.formats.naturaldate import parse_natural

NOW = datetime(2016, 12, 10, 6, 45, 0, tzinfo=timezone.utc)  # a Saturday


def p(s, tz="UTC"):
    return parse_natural(s, NOW, tz)


def test_now_today():
    assert p("now") == NOW
    assert p("Today") == NOW
    assert p("  now  ") == NOW


def test_yesterday_tomorrow():
    assert p("yesterday") == NOW - timedelta(days=1)
    assert p("tomorrow") == NOW + timedelta(days=1)


def test_epoch_seconds_and_millis():
    # the reference test row "1485800109"
    assert p("1485800109") == datetime(2017, 1, 30, 18, 15, 9, tzinfo=timezone.utc)
    assert p("1485800109000") == datetime(2017, 1, 30, 18, 15, 9, tzinfo=timezone.utc)


def test_month_name_forms():
    # the reference test row "september 7th 2016"
    assert p("september 7th 2016") == datetime(2016, 9, 7, tzinfo=timezone.utc)
    assert p("Sep 7, 2016") == datetime(2016, 9, 7, tzinfo=timezone.utc)
    assert p("7 september 2016") == datetime(2016, 9, 7, tzinfo=timezone.utc)
    assert p("7th of September 2016") == datetime(2016, 9, 7, tzinfo=timezone.utc)
    # year defaults to the current one
    assert p("march 3rd") == datetime(2016, 3, 3, tzinfo=timezone.utc)
    # with a time
    assert p("september 7th 2016 at 6:45 pm") == datetime(2016, 9, 7, 18, 45, tzinfo=timezone.utc)
    # invalid day-of-month → no match, not an exception
    assert p("february 31 2016") is None


def test_next_last_weekday():
    # NOW is Saturday 2016-12-10; next tuesday = 12-13, last tuesday = 12-06
    assert p("next tuesday") == datetime(2016, 12, 13, tzinfo=timezone.utc)
    assert p("last tuesday") == datetime(2016, 12, 6, tzinfo=timezone.utc)
    # same weekday never resolves to today
    assert p("next saturday") == datetime(2016, 12, 17, tzinfo=timezone.utc)
    assert p("last saturday") == datetime(2016, 12, 3, tzinfo=timezone.utc)
    assert p("next week") == datetime(2016, 12, 17, tzinfo=timezone.utc)
    assert p("last month") == datetime(2016, 11, 10, tzinfo=timezone.utc)
    assert p("next year") == datetime(2017, 12, 10, tzinfo=timezone.utc)


def test_relative_deltas():
    assert p("3 days ago") == NOW - timedelta(days=3)
    assert p("1 day ago") == NOW - timedelta(days=1)
    assert p("2 weeks ago") == NOW - timedelta(weeks=2)
    assert p("in 2 days") == NOW + timedelta(days=2)
    assert p("5 hours from now") == NOW + timedelta(hours=5)
    assert p("1 month ago") == datetime(2016, 11, 10, 6, 45, tzinfo=timezone.utc)


def test_timezone_midnight():
    # month-name date resolves to local midnight in the directive timezone
    got = p("september 7th 2016", tz="US/Eastern")
    assert got == datetime(2016, 9, 7, 4, 0, tzinfo=timezone.utc)  # EDT = UTC-4


def test_no_match_returns_none():
    assert p("not a date") is None
    assert p("") is None
    assert p(None) is None
    assert p("123") is None  # not an epoch shape


def test_directive_mixes_formats_and_natural(spark):
    """The reference's testDateParser row set: formats parse natively,
    natural shapes fall through to the Arrow UDF, garbage stays null."""
    rows = [("12/10/2016",), ("september 7th 2016",), ("1485800109",),
            ("now",), ("garbage",), (None,)]
    df = spark.createDataFrame(rows, ["date"])
    out = Pipeline.compile("parse-as-date :date").apply(df)
    got = {r["date"]: r["date_1"] for r in out.collect()}
    assert got["12/10/2016"] == datetime(2016, 12, 10)
    assert got["september 7th 2016"] == datetime(2016, 9, 7)
    assert got["1485800109"] == datetime(2017, 1, 30, 18, 15, 9)
    assert got["now"] is not None
    assert got["garbage"] is None
    assert got[None] is None


def test_the_nth_of_month_and_weekday_prefix():
    """Round-6 natty-form widening: 'the Nth of <month> <year>', weekday-
    prefixed dates ('fri jan 3' — weekday is decoration, not validated),
    with optional comma/time still composing."""
    assert p("the 31st of december 2017") == datetime(2017, 12, 31, tzinfo=timezone.utc)
    assert p("the 3rd of march") == datetime(2016, 3, 3, tzinfo=timezone.utc)
    assert p("fri jan 3") == datetime(2016, 1, 3, tzinfo=timezone.utc)
    assert p("friday, january 3 2020") == datetime(2020, 1, 3, tzinfo=timezone.utc)
    assert p("wed september 7th 2016") == datetime(2016, 9, 7, tzinfo=timezone.utc)
    assert p("sat 1st of may 2021 at 9:30 pm") == datetime(
        2021, 5, 1, 21, 30, tzinfo=timezone.utc
    )
    # weekday alone (no date) is still not a date in this grammar
    assert p("friday") is None


def test_relative_day_with_time():
    # NOW is Saturday 2016-12-10 06:45 UTC
    assert p("tomorrow at 3pm") == datetime(2016, 12, 11, 15, 0, tzinfo=timezone.utc)
    assert p("yesterday 10:30") == datetime(2016, 12, 9, 10, 30, tzinfo=timezone.utc)
    assert p("today at noon") == datetime(2016, 12, 10, 12, 0, tzinfo=timezone.utc)
    assert p("tomorrow at midnight") == datetime(2016, 12, 11, 0, 0, tzinfo=timezone.utc)
    assert p("today at 12am") == datetime(2016, 12, 10, 0, 0, tzinfo=timezone.utc)


def test_day_before_after():
    assert p("the day before yesterday") == NOW - timedelta(days=2)
    assert p("day after tomorrow") == NOW + timedelta(days=2)
    assert p("the day after tomorrow at 9:15") == datetime(
        2016, 12, 12, 9, 15, tzinfo=timezone.utc
    )


def test_this_weekday():
    # "this saturday" on a Saturday is today; "this tuesday" the nearest
    # upcoming tuesday (natty's nearest-occurrence rule)
    assert p("this saturday") == datetime(2016, 12, 10, tzinfo=timezone.utc)
    assert p("this tuesday") == datetime(2016, 12, 13, tzinfo=timezone.utc)


def test_article_counts():
    assert p("a week ago") == NOW - timedelta(weeks=1)
    assert p("in an hour") == NOW + timedelta(hours=1)
    assert p("a month ago") == datetime(2016, 11, 10, 6, 45, tzinfo=timezone.utc)


def test_month_year():
    assert p("october 2006") == datetime(2006, 10, 1, tzinfo=timezone.utc)
    assert p("May 2016") == datetime(2016, 5, 1, tzinfo=timezone.utc)


def test_relday_time_out_of_range_clock_is_unparseable():
    """'tomorrow at 25:00' must return None (like every other branch),
    not raise ValueError out of the pandas UDF."""
    for s in ("tomorrow at 25:00", "today at 99", "yesterday 5:75"):
        assert p(s) is None
    assert p("tomorrow at 12:30") is not None


def test_next_last_with_clock_time():
    """natty composes next/last/this phrases with times: the weekday
    anchor keeps its date, the clock replaces midnight; bad clocks are
    unparseable (None), never a UDF crash."""
    # NOW is Saturday 2016-12-10; next friday = 2016-12-16
    assert p("next friday at 3pm") == datetime(2016, 12, 16, 15, 0, tzinfo=timezone.utc)
    assert p("last monday 10:30") == datetime(2016, 12, 5, 10, 30, tzinfo=timezone.utc)
    assert p("this tuesday at 9:15:30 am") == datetime(2016, 12, 13, 9, 15, 30, tzinfo=timezone.utc)
    assert p("next month at noon") == datetime(2017, 1, 10, 12, 0, tzinfo=timezone.utc)
    assert p("next week 8am") == datetime(2016, 12, 17, 8, 0, tzinfo=timezone.utc)
    assert p("next friday at 25:00") is None        # out-of-range clock
    # the bare forms still anchor at midnight
    assert p("next friday") == datetime(2016, 12, 16, tzinfo=timezone.utc)


def test_day_of_relative_month():
    # NOW = 2016-12-10 (Sat): next month = Jan 2017, last = Nov 2016
    assert p("the 3rd of next month") == datetime(2017, 1, 3, tzinfo=timezone.utc)
    assert p("15th of last month") == datetime(2016, 11, 15, tzinfo=timezone.utc)
    assert p("the 1st of this month") == datetime(2016, 12, 1, tzinfo=timezone.utc)
    # clock-time composition rides along
    assert p("the 3rd of next month at 3pm") == datetime(2017, 1, 3, 15, tzinfo=timezone.utc)
    assert p("the 3rd of next month at noon") == datetime(2017, 1, 3, 12, tzinfo=timezone.utc)
    # a day the target month doesn't have is unparseable, never clamped
    assert p("the 31st of last month") is None            # Nov has 30
    # existing absolute day-of-month grammar is untouched
    assert p("the 3rd of january") == datetime(2016, 1, 3, tzinfo=timezone.utc)


def test_bare_month_anchor():
    # nearest UPCOMING occurrence: month >= current -> this year
    assert p("december") == datetime(2016, 12, 1, tzinfo=timezone.utc)
    assert p("in october") == datetime(2017, 10, 1, tzinfo=timezone.utc)   # past -> next year
    assert p("March") == datetime(2017, 3, 1, tzinfo=timezone.utc)
    # month-year stays on natty's explicit-year rule
    assert p("october 2006") == datetime(2006, 10, 1, tzinfo=timezone.utc)
    # timezone-aware: the 1st is the LOCAL first-of-month
    tokyo = p("december", tz="Asia/Tokyo")
    assert tokyo == datetime(2016, 11, 30, 15, 0, tzinfo=timezone.utc)
