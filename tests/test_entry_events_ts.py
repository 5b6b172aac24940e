"""Events-table `ts` robustness: the driver testdata has shipped the events
timestamp under three different parquet physical types across generations
(int64 nanos read via nanosAsLong, TIMESTAMP micros adjusted-to-UTC, and
TIMESTAMP_NTZ micros). `__spark_entry__._t` must normalize all three to a
session-TZ TIMESTAMP with identical microsecond values — a regeneration of
/root/testdata must never silently break every events-reading query again
(this zeroed 13 queries in round 3)."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

import __spark_entry__ as entry_mod

_UTC = datetime.timezone.utc
_TS = [
    datetime.datetime(2020, 1, 1, 0, 0, 0, 123456, tzinfo=_UTC),
    datetime.datetime(2021, 6, 15, 12, 30, 45, 999999, tzinfo=_UTC),
    datetime.datetime(2023, 12, 31, 23, 59, 59, 1, tzinfo=_UTC),
]
_EXPECT_MICROS = [int(t.timestamp() * 1_000_000) for t in _TS]


def _write_events(tmp_path, variant: str) -> str:
    micros = _EXPECT_MICROS
    if variant == "int64_nanos":
        arr = pa.array([m * 1000 for m in micros], type=pa.int64())
        # declare the column as TIMESTAMP(NANOS) so Spark hits the
        # nanosAsLong legacy path instead of reading a plain long
        arr = arr.cast(pa.timestamp("ns", tz="UTC"))
    elif variant == "micros_utc":
        arr = pa.array(micros, type=pa.int64()).cast(pa.timestamp("us", tz="UTC"))
    elif variant == "micros_ntz":
        arr = pa.array(micros, type=pa.int64()).cast(pa.timestamp("us"))
    else:  # pragma: no cover
        raise AssertionError(variant)
    table = pa.table({"event_id": pa.array([1, 2, 3], type=pa.int64()), "ts": arr})
    d = tmp_path / variant
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("variant", ["int64_nanos", "micros_utc", "micros_ntz"])
def test_t_normalizes_every_ts_physical_type(spark, tmp_path, variant):
    sf_dir = _write_events(tmp_path, variant)
    df = entry_mod._t(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"{variant}: expected session-TZ TIMESTAMP, got {df.schema['ts'].dataType}"
    )
    got = [
        r[0]
        for r in df.orderBy("event_id").select(F.unix_micros("ts")).collect()
    ]
    assert got == _EXPECT_MICROS, f"{variant}: micros mismatch"
