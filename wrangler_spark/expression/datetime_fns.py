"""`datetime:` EL namespace — DataStage-style date/time functions.

Parity surface: ``wrangler-core/.../functions/DateAndTime.java`` (51 fns).
LocalDate → Spark DateType, LocalDateTime → TimestampNTZ, ZonedDateTime →
TimestampType (UTC session zone), LocalTime (no Spark type) → seconds of
day as int where a time value flows, string "HH:mm:ss" where one is shown.
All native Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from wrangler_spark.expression.translator import TC

_JULIAN_EPOCH_OFFSET = 2440588  # Julian Day Number of 1970-01-01


def _seconds_of_day(t: Column) -> Column:
    """A 'time' value in this engine is seconds since midnight (int) or a
    HH:mm:ss string; normalize to seconds."""
    return (
        F.when(
            t.cast("string").rlike(r"^\d{1,2}:\d{2}(:\d{2})?$"),
            F.split(t.cast("string"), ":")[0].cast("int") * 3600
            + F.split(t.cast("string"), ":")[1].cast("int") * 60
            + F.coalesce(F.split(t.cast("string"), ":")[2].cast("int"), F.lit(0)),
        )
        .otherwise(t.cast("int"))
    )


def datetime_fns():
    return {
        "getdate": lambda tr, a: TC(F.to_date(a[0].col), "date"),
        "getdatetime": lambda tr, a: (
            TC(F.to_timestamp_ntz(a[0].col), "ts")
            if len(a) == 1
            # 2-arg form: GetDateTime(date, time) — midnight of date + time-of-day
            else TC(
                a[0].col.cast("date").cast("timestamp_ntz") + F.make_interval(secs=_seconds_of_day(a[1].col)),
                "ts",
            )
        ),
        "gettime": lambda tr, a: TC(_seconds_of_day(a[0].col), "num"),
        "currentdate": lambda tr, a: TC(F.current_date(), "date"),
        "currenttime": lambda tr, a: TC(
            F.hour(F.current_timestamp()) * 3600 + F.minute(F.current_timestamp()) * 60 + F.second(F.current_timestamp()),
            "num",
        ),
        "currenttimems": lambda tr, a: TC(F.unix_millis(F.current_timestamp()), "num"),
        "currentdatetime": lambda tr, a: TC(F.localtimestamp(), "ts"),
        "currenttimestamp": lambda tr, a: TC(F.current_timestamp(), "ts"),
        "epochseconds": lambda tr, a: TC(F.unix_seconds(F.current_timestamp()), "num"),
        "currenttimestampms": lambda tr, a: TC(F.unix_millis(F.current_timestamp()), "num"),
        "datefromdayssince": lambda tr, a: TC(
            F.date_add(a[1].col.cast("date") if len(a) > 1 else F.to_date(F.lit("1970-01-01")), a[0].col.cast("int")), "date"
        ),
        "datefromcomponents": lambda tr, a: TC(F.make_date(a[0].col, a[1].col, a[2].col), "date"),
        "datefromjulianday": lambda tr, a: TC(
            F.date_add(F.to_date(F.lit("1970-01-01")), (a[0].col - _JULIAN_EPOCH_OFFSET).cast("int")), "date"
        ),
        "dateoffsetbycomponents": lambda tr, a: TC(
            F.add_months(a[0].col.cast("date"), a[1].col * 12 + a[2].col) + F.make_interval(days=a[3].col.cast("int")),
            "date",
        ),
        "dayssincefromdate": lambda tr, a: TC(F.datediff(a[1].col.cast("date"), a[0].col.cast("date")).cast("long"), "num"),
        "daysinmonth": lambda tr, a: TC(F.dayofmonth(F.last_day(a[0].col.cast("date"))), "num"),
        "daysinyear": lambda tr, a: TC(
            F.when((F.year(a[0].col) % 4 == 0) & ((F.year(a[0].col) % 100 != 0) | (F.year(a[0].col) % 400 == 0)), 366).otherwise(365),
            "num",
        ),
        "dateoffsetbydays": lambda tr, a: TC(F.date_add(a[0].col.cast("date"), a[1].col.cast("int")), "date"),
        "hoursfromtime": lambda tr, a: TC((_seconds_of_day(a[0].col) / 3600).cast("int"), "num"),
        "juliandayfromdate": lambda tr, a: TC(
            (F.datediff(a[0].col.cast("date"), F.to_date(F.lit("1970-01-01"))) + _JULIAN_EPOCH_OFFSET).cast("long"), "num"
        ),
        "millisecondsfromtime": lambda tr, a: TC(_seconds_of_day(a[0].col) * 1000, "num"),
        "microsecondsfromtime": lambda tr, a: TC(_seconds_of_day(a[0].col) * 1000000, "num"),
        "nanosecondsfromtime": lambda tr, a: TC(_seconds_of_day(a[0].col) * 1000000000, "num"),
        "midnightsecondsfromtime": lambda tr, a: TC(_seconds_of_day(a[0].col), "num"),
        "minutesfromtime": lambda tr, a: TC(((_seconds_of_day(a[0].col) % 3600) / 60).cast("int"), "num"),
        "secondsfromtime": lambda tr, a: TC(_seconds_of_day(a[0].col) % 60, "num"),
        "monthdayfromdate": lambda tr, a: TC(F.dayofmonth(a[0].col.cast("date")), "num"),
        "monthfromdate": lambda tr, a: TC(F.month(a[0].col.cast("date")), "num"),
        "weekdayfromdate": lambda tr, a: TC(F.dayofweek(a[0].col.cast("date")), "num"),
        "yeardayfromdate": lambda tr, a: TC(F.dayofyear(a[0].col.cast("date")), "num"),
        "yearfromdate": lambda tr, a: TC(F.year(a[0].col.cast("date")), "num"),
        "yearweekfromdate": lambda tr, a: TC(F.weekofyear(a[0].col.cast("date")), "num"),
        "secondssincefromdatetime": lambda tr, a: TC(
            (F.unix_seconds(a[1].col.cast("timestamp")) - F.unix_seconds(a[0].col.cast("timestamp"))).cast("long"), "num"
        ),
        "timefromcomponents": lambda tr, a: TC(a[0].col * 3600 + a[1].col * 60 + a[2].col, "num"),
        "timefrommidnightseconds": lambda tr, a: TC(a[0].col.cast("int"), "num"),
        "timeoffsetbycomponents": lambda tr, a: TC(
            _seconds_of_day(a[0].col) + a[1].col * 3600 + a[2].col * 60 + a[3].col, "num"
        ),
        "datetimefromsecondssince": lambda tr, a: TC(
            a[1].col.cast("timestamp_ntz") + F.make_interval(secs=a[0].col.cast("int")), "ts"
        ),
        "datetimefromepoch": lambda tr, a: TC(F.timestamp_seconds(a[0].col).cast("timestamp_ntz"), "ts"),
        "datetimeoffsetbyseconds": lambda tr, a: TC(
            a[0].col.cast("timestamp_ntz") + F.make_interval(secs=a[1].col.cast("int")), "ts"
        ),
        "epochfromdatetime": lambda tr, a: TC(F.unix_seconds(a[0].col.cast("timestamp")), "num"),
        "epochfromtimestamp": lambda tr, a: TC(F.unix_seconds(a[0].col.cast("timestamp")), "num"),
        "timedate": lambda tr, a: TC(F.date_format(F.current_timestamp(), "HH:mm:ss dd MMM yyyy"), "str"),
    }
