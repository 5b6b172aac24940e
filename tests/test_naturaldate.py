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
    # weekday alone now parses (nearest-upcoming, the r11 tranche) —
    # see test_bare_weekday_nearest_upcoming; a weekday PREFIX on a full
    # date stays pure decoration, tested above


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


def test_bare_clock_times():
    """natty: a bare time resolves to TODAY at that time; a bare number
    without colon or am/pm stays unparseable."""
    d = datetime(2016, 12, 10, tzinfo=timezone.utc)
    assert p("noon") == d.replace(hour=12)
    assert p("midnight") == d
    assert p("3pm") == d.replace(hour=15)
    assert p("3 AM") == d.replace(hour=3)
    assert p("12am") == d
    assert p("12 pm") == d.replace(hour=12)
    assert p("10:30") == d.replace(hour=10, minute=30)
    assert p("10:30:15 pm") == d.replace(hour=22, minute=30, second=15)
    assert p("at 10:30") == d.replace(hour=10, minute=30)
    assert p("3") is None            # ambiguous bare number
    assert p("25:10") is None        # invalid clock


def test_fuzzy_prefixes_are_decoration():
    assert p("around noon") == p("noon")
    assert p("about 3pm") == p("3pm")
    assert p("roughly next tuesday") == p("next tuesday")
    assert p("approximately 2 days ago") == p("2 days ago")
    assert p("around nonsense") is None


def test_nth_weekday_of_month():
    # NOW = Sat 2016-12-10
    assert p("the first monday of june") == datetime(2017, 6, 5, tzinfo=timezone.utc)
    assert p("first monday of december") == datetime(2016, 12, 5, tzinfo=timezone.utc)
    assert p("second tuesday of december 2016") == datetime(2016, 12, 13, tzinfo=timezone.utc)
    assert p("last friday of march 2024") == datetime(2024, 3, 29, tzinfo=timezone.utc)
    assert p("last wednesday of february 2024") == datetime(2024, 2, 28, tzinfo=timezone.utc)
    # next month = jan 2017: first sunday = jan 1
    assert p("the first sunday of next month") == datetime(2017, 1, 1, tzinfo=timezone.utc)
    assert p("third thursday of this month") == datetime(2016, 12, 15, tzinfo=timezone.utc)
    # clock-time composition
    assert p("first monday of june at 3pm") == datetime(2017, 6, 5, 15, tzinfo=timezone.utc)
    assert p("last friday of march 2024 at noon") == datetime(2024, 3, 29, 12, tzinfo=timezone.utc)
    # june 2017 has only four mondays
    assert p("fifth monday of june 2017") is None


def test_date_ranges_resolve_to_start():
    assert p("between march 3 and march 5") == p("march 3")
    assert p("from december 12 to december 14 2016") == datetime(2016, 12, 12, tzinfo=timezone.utc)
    assert p("from monday to friday") == p("this monday")
    assert p("between tomorrow and next friday") == p("tomorrow")
    # half-ranges are malformed, not dates
    assert p("between march 3 and nonsense") is None
    assert p("between nonsense and march 3") is None
    # "from now" keeps its relative meaning (no false range match)
    assert p("2 weeks from now") == NOW + timedelta(weeks=2)


def test_bare_weekday_nearest_upcoming():
    # NOW = Sat 2016-12-10: "saturday" is today, "friday" is the 16th
    assert p("saturday") == datetime(2016, 12, 10, tzinfo=timezone.utc)
    assert p("friday") == datetime(2016, 12, 16, tzinfo=timezone.utc)
    assert p("on tuesday") == datetime(2016, 12, 13, tzinfo=timezone.utc)
    assert p("friday at 3pm") == datetime(2016, 12, 16, 15, tzinfo=timezone.utc)
    assert p("tue at noon") == datetime(2016, 12, 13, 12, tzinfo=timezone.utc)


def test_relative_to_anchor_composition():
    # NOW = Sat 2016-12-10 06:45 UTC
    assert p("a week from tomorrow") == NOW + timedelta(days=8)
    assert p("2 days after next friday") == datetime(
        2016, 12, 18, tzinfo=timezone.utc)   # next fri = 12/16 00:00 + 2d
    assert p("3 days before christmas") == datetime(
        2016, 12, 22, tzinfo=timezone.utc)
    assert p("an hour from now") == NOW + timedelta(hours=1)
    # anchor must itself parse; unknown units stay unparseable
    assert p("2 days after nonsense") is None
    assert p("2 blargs from tomorrow") is None
    # "3 days from now" keeps its _RE_IN meaning (regression guard)
    assert p("3 days from now") == NOW + timedelta(days=3)


def test_period_edges():
    # NOW = Sat 2016-12-10; ISO week starts Monday 12/05
    assert p("beginning of the week") == datetime(2016, 12, 5, tzinfo=timezone.utc)
    assert p("end of the week") == datetime(2016, 12, 11, tzinfo=timezone.utc)
    assert p("start of next week") == datetime(2016, 12, 12, tzinfo=timezone.utc)
    assert p("end of the month") == datetime(2016, 12, 31, tzinfo=timezone.utc)
    assert p("beginning of next month") == datetime(2017, 1, 1, tzinfo=timezone.utc)
    assert p("end of last month") == datetime(2016, 11, 30, tzinfo=timezone.utc)
    assert p("end of the year") == datetime(2016, 12, 31, tzinfo=timezone.utc)
    assert p("beginning of next year") == datetime(2017, 1, 1, tzinfo=timezone.utc)
    # composes with clock times
    assert p("end of the month at 5pm") == datetime(
        2016, 12, 31, 17, tzinfo=timezone.utc)


def test_holidays():
    # bare holiday: nearest upcoming (NOW is 2016-12-10)
    assert p("christmas") == datetime(2016, 12, 25, tzinfo=timezone.utc)
    assert p("christmas eve") == datetime(2016, 12, 24, tzinfo=timezone.utc)
    assert p("halloween") == datetime(2017, 10, 31, tzinfo=timezone.utc)  # past
    assert p("new year's day") == datetime(2017, 1, 1, tzinfo=timezone.utc)
    # explicit year wins
    assert p("christmas 2020") == datetime(2020, 12, 25, tzinfo=timezone.utc)
    # next/last are strict
    assert p("last christmas") == datetime(2015, 12, 25, tzinfo=timezone.utc)
    assert p("next halloween") == datetime(2017, 10, 31, tzinfo=timezone.utc)
    # thanksgiving floats: 4th Thursday of November
    assert p("thanksgiving 2016") == datetime(2016, 11, 24, tzinfo=timezone.utc)
    assert p("thanksgiving") == datetime(2017, 11, 23, tzinfo=timezone.utc)
    # clock-time composition + range/anchor composition through recursion
    assert p("christmas at noon") == datetime(2016, 12, 25, 12, tzinfo=timezone.utc)
    assert p("a week before christmas") == datetime(2016, 12, 18, tzinfo=timezone.utc)
    # "july 4th" stays the MDY branch's current-year form (documented)
    assert p("july 4th") == datetime(2016, 7, 4, tzinfo=timezone.utc)
    assert p("fourth of july") == datetime(2017, 7, 4, tzinfo=timezone.utc)


def test_fortnight_unit():
    # NOW is Saturday 2016-12-10 06:45 UTC
    assert p("a fortnight ago") == datetime(2016, 11, 26, 6, 45, tzinfo=timezone.utc)
    assert p("in 2 fortnights") == datetime(2017, 1, 7, 6, 45, tzinfo=timezone.utc)
    # composes through the from/after/before anchor grammar
    assert p("a fortnight from tomorrow") == datetime(
        2016, 12, 25, 6, 45, tzinfo=timezone.utc)


def test_iso_week_numbers():
    assert p("week 12 of 2020") == datetime(2020, 3, 16, tzinfo=timezone.utc)
    assert p("week 1, 2021") == datetime(2021, 1, 4, tzinfo=timezone.utc)
    assert p("2020-W12") == datetime(2020, 3, 16, tzinfo=timezone.utc)
    # 2020 is a 53-week ISO year; week 54 is malformed, not clamped
    assert p("2020w53") == datetime(2020, 12, 28, tzinfo=timezone.utc)
    assert p("week 54 of 2020") is None


def test_middle_of_period_edges():
    # week is Monday-start: middle = Thursday 00:00 (Dec 5 week -> Dec 8)
    assert p("middle of the week") == datetime(2016, 12, 8, tzinfo=timezone.utc)
    assert p("middle of the month") == datetime(2016, 12, 15, tzinfo=timezone.utc)
    assert p("middle of next month") == datetime(2017, 1, 15, tzinfo=timezone.utc)
    assert p("middle of next year") == datetime(2017, 7, 1, tzinfo=timezone.utc)
    # existing edges unaffected
    assert p("end of the month") == datetime(2016, 12, 31, tzinfo=timezone.utc)
