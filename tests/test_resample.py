"""Per-key time-series resample with gap-fill: dense grids, fill
semantics (zero / none / ffill with leading-gap NULLs), micro-unit agg
determinism, the max_periods guard, and the directive form."""

import pytest
from pyspark.sql import functions as F

from wrangler_spark.datapipe import events
from wrangler_spark.pipeline import Pipeline


@pytest.fixture()
def ts_frame(spark):
    # key "a": buckets 0, 2 (gap at 1); key "b": single bucket
    return spark.createDataFrame(
        [
            ("a", "1970-01-01 00:10:00", 1.0),
            ("a", "1970-01-01 00:20:00", 2.0),
            ("a", "1970-01-01 02:30:00", 10.0),
            ("b", "1970-01-01 05:00:00", 7.0),
            (None, "1970-01-01 00:00:00", 99.0),
            ("c", None, 99.0),
        ],
        "k string, t string, v double",
    ).select("k", F.col("t").cast("timestamp").alias("t"), "v")


def _grid(df, **kw):
    out = events.resample(df, "k", "t", "v", every_minutes=60, **kw)
    return {(r["k"], r["bucket"]): r["value"] for r in out.collect()}


def test_zero_fill_and_sum(ts_frame):
    g = _grid(ts_frame, agg="sum", fill="zero")
    # null key and null ts rows drop; "a" spans buckets 0..2 densely
    assert g == {("a", 0): 3.0, ("a", 1): 0.0, ("a", 2): 10.0, ("b", 5): 7.0}


def test_ffill_and_none(ts_frame):
    g = _grid(ts_frame, agg="sum", fill="ffill")
    assert g[("a", 1)] == 3.0  # forward-filled from bucket 0
    g = _grid(ts_frame, agg="sum", fill="none")
    assert g[("a", 1)] is None


def test_null_value_rows_drop_and_grid_starts_at_first_cell(spark):
    # a null-value row contributes no cell under agg=min, so the key's
    # grid starts at its first REAL cell — ffill therefore always has a
    # value to fill from (no leading-gap NULLs by construction)
    df = spark.createDataFrame(
        [("a", "1970-01-01 00:00:00", None),
         ("a", "1970-01-01 02:00:00", 5.0),
         ("a", "1970-01-01 04:00:00", 6.0)],
        "k string, t string, v double",
    ).select("k", F.col("t").cast("timestamp").alias("t"), "v")
    g = _grid(df, agg="min", fill="ffill")
    assert g == {("a", 2): 5.0, ("a", 3): 5.0, ("a", 4): 6.0}


def test_count_avg_min_max(ts_frame):
    g = _grid(ts_frame, agg="count", fill="zero")
    assert g[("a", 0)] == 2.0 and g[("a", 1)] == 0.0
    g = _grid(ts_frame, agg="avg", fill="none")
    assert g[("a", 0)] == 1.5
    g = _grid(ts_frame, agg="max", fill="none")
    assert g[("a", 0)] == 2.0
    g = _grid(ts_frame, agg="min", fill="none")
    assert g[("a", 0)] == 1.0


def test_bucket_ts_and_invariance(ts_frame):
    out = events.resample(ts_frame, "k", "t", "v", every_minutes=60)
    row = {r["bucket"]: r for r in out.filter("k = 'a'").collect()}
    assert str(row[1]["bucket_ts"]).startswith("1970-01-01 01:00")
    a = sorted(map(tuple, events.resample(
        ts_frame.repartition(1), "k", "t", "v", agg="sum").drop("bucket_ts").collect()))
    b = sorted(map(tuple, events.resample(
        ts_frame.repartition(9), "k", "t", "v", agg="sum").drop("bucket_ts").collect()))
    assert a == b


def test_guards(ts_frame):
    with pytest.raises(ValueError, match="spans"):
        events.resample(ts_frame, "k", "t", "v", every_minutes=1,
                        max_periods=10)
    with pytest.raises(ValueError, match="unknown agg"):
        events.resample(ts_frame, "k", "t", "v", agg="median")
    with pytest.raises(ValueError, match="unknown fill"):
        events.resample(ts_frame, "k", "t", "v", fill="bfill")
    with pytest.raises(ValueError, match="needs value_col"):
        events.resample(ts_frame, "k", "t", agg="sum")
    with pytest.raises(ValueError, match="every_minutes"):
        events.resample(ts_frame, "k", "t", "v", every_minutes=0)


def test_wide_span_stateless_fill_is_linear(spark):
    # the zero/none fills run as a LINEAR F.transform over the bucket
    # sequence, not the ffill fold (which re-copies the accumulated
    # output array every step — O(span²) element copies: a 50k-bucket
    # key would pay ~1.25e9 copies in one task). One key spanning 50k
    # minute-buckets with two real cells must fill densely and fast.
    span = 50_000
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", (span - 1) * 60, 2.0)],
        "k string, sec long, v double",
    ).select("k", F.timestamp_seconds(F.col("sec")).alias("t"), "v")
    import time
    t0 = time.monotonic()
    out = events.resample(df, "k", "t", "v", every_minutes=1, agg="sum",
                          fill="zero")
    n = out.count()
    zeros = out.filter("value = 0.0").count()
    elapsed = time.monotonic() - t0
    assert n == span and zeros == span - 2
    # linear path: well under a second of fill work; the quadratic
    # fold takes minutes at this span (generous bound for slow boxes)
    assert elapsed < 30, f"wide-span fill took {elapsed:.1f}s — quadratic?"
    # none-fill uses the same linear path
    g = events.resample(df, "k", "t", "v", every_minutes=1, agg="sum",
                        fill="none")
    assert g.filter("value IS NULL").count() == span - 2


def test_directive(ts_frame):
    out = Pipeline.compile("resample :k :t :v 60 sum ffill").apply(ts_frame)
    g = {(r["k"], r["bucket"]): r["value"] for r in out.collect()}
    assert g[("a", 1)] == 3.0


def test_rolling_stats_vs_python_reference(spark):
    import math

    vals = [3.0, 1.5, 4.25, 4.25, 7.125, 2.0, 9.5, 0.25]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)], "k string, b long, v double")
    got = {r["bucket"]: r for r in
           events.rolling_stats(df, "k", "b", "v", window=3).collect()}
    for i, v in enumerate(vals):
        win = vals[max(0, i - 2):i + 1]
        mean = round(sum(win) / len(win), 6)
        var = sum(x * x for x in win) / len(win) - (sum(win) / len(win)) ** 2
        std = round(math.sqrt(max(var, 0.0)), 6)
        r = got[i]
        assert r["roll_mean"] == pytest.approx(mean, abs=2e-6)
        assert r["roll_std"] == pytest.approx(std, abs=2e-6)
        if std > 0:
            assert r["zscore"] == pytest.approx(
                round((v - r["roll_mean"]) / r["roll_std"], 6), abs=2e-6)
        else:
            assert r["zscore"] is None


def test_rolling_stats_invariance_and_guard(spark):
    df = spark.range(200).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") / 3).cast("long").alias("b"),
        ((F.col("id") * 37 % 101) / 7.0).alias("v"),
    )
    a = sorted(map(tuple, events.rolling_stats(
        df.repartition(1), "k", "b", "v", 7).collect()))
    b = sorted(map(tuple, events.rolling_stats(
        df.repartition(13), "k", "b", "v", 7).collect()))
    assert a == b and len(a) == 200
    with pytest.raises(ValueError, match="window"):
        events.rolling_stats(df, "k", "b", "v", window=0)


def test_rolling_anomaly_spike_detected(spark):
    # flat series with one spike: the spike's z-score dominates
    rows = [("a", i, 10.0) for i in range(20)] + [("a", 20, 100.0)]
    df = spark.createDataFrame(rows, "k string, b long, v double")
    out = events.rolling_stats(df, "k", "b", "v", window=7).collect()
    spike = [r for r in out if r["bucket"] == 20][0]
    rest = [r["zscore"] for r in out if r["bucket"] != 20]
    assert spike["zscore"] > 2.0
    assert all(z is None or abs(z) < 2.0 for z in rest)


def test_interp_fill(spark):
    df = spark.createDataFrame(
        [("a", "1970-01-01 00:00:00", 1.0),
         ("a", "1970-01-01 03:00:00", 7.0),
         ("a", "1970-01-01 04:00:00", 4.0),
         ("b", "1970-01-01 00:00:00", 2.0)],
        "k string, t string, v double",
    ).select("k", F.col("t").cast("timestamp").alias("t"), "v")
    g = _grid(df, agg="sum", fill="interp")
    assert g == {("a", 0): 1.0, ("a", 1): 3.0, ("a", 2): 5.0,
                 ("a", 3): 7.0, ("a", 4): 4.0, ("b", 0): 2.0}
    # non-integer slope rounds 6dp
    df2 = spark.createDataFrame(
        [("a", "1970-01-01 00:00:00", 0.0),
         ("a", "1970-01-01 03:00:00", 1.0)],
        "k string, t string, v double",
    ).select("k", F.col("t").cast("timestamp").alias("t"), "v")
    g2 = _grid(df2, agg="sum", fill="interp")
    assert g2[("a", 1)] == 0.333333 and g2[("a", 2)] == 0.666667


def test_resample_state_folds_equal_one_shot(spark, tmp_path_factory):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    path = str(tmp_path_factory.mktemp("rsstate")) + "/st"
    for i in range(3):
        events.resample_update_state(
            ev.filter(F.col("event_id") % 3 == i), path,
            "event_type", "ts", "value", every_minutes=60, batch_id=f"b{i}")
    for agg in ("count", "sum", "avg", "min", "max"):
        rec = sorted(map(tuple, events.resample_from_state(
            spark, path, agg=agg, fill="zero").drop("bucket_ts").collect()))
        one = sorted(map(tuple, events.resample(
            ev, "event_type", "ts", "value", 60, agg=agg, fill="zero")
            .drop("bucket_ts")
            .select(F.col("event_type").cast("string"), "bucket", "value")
            .collect()))
        assert rec == one, agg
    # replay NO-OP + pinned grain
    events.resample_update_state(
        ev.filter(F.col("event_id") % 3 == 0), path,
        "event_type", "ts", "value", 60, batch_id="b0")
    rec2 = events.resample_from_state(spark, path, agg="count").count()
    assert rec2 == events.resample(ev, "event_type", "ts", None, 60).count()
    with pytest.raises(ValueError, match="incompatible"):
        events.resample_update_state(
            ev, path, "event_type", "ts", "value", 30, batch_id="b9")
    with pytest.raises(ValueError, match="empty"):
        events.resample_from_state(
            spark, str(tmp_path_factory.mktemp("rsempty")) + "/st")


def test_resample_stream_monitor(spark, tmp_path_factory):
    import shutil as _sh

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "ts", "value")
    src = str(tmp_path_factory.mktemp("rs_src"))
    state = str(tmp_path_factory.mktemp("rs_state") / "st")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_type string, ts timestamp, value double").parquet(src)
    q = events.resample_update_stream(
        stream, state, "event_type", "ts", src + "_chk", "value", 60)
    q.awaitTermination(120)
    # the dashboard read: state grid + rolling band, event log untouched
    grid = events.resample_from_state(spark, state, agg="sum", fill="zero")
    band = events.rolling_stats(
        grid.drop("bucket_ts"), "key", "bucket", "value", window=24)
    assert band.count() == grid.count() > 0
    one = sorted(map(tuple, events.resample(
        ev, "event_type", "ts", "value", 60, agg="sum", fill="zero")
        .drop("bucket_ts").collect()))
    rec = sorted(map(tuple, grid.drop("bucket_ts").collect()))
    assert rec == one
    _sh.rmtree(src, ignore_errors=True)


def test_seasonality(spark):
    # 1970-01-01 was a Thursday (ISO 4); hours are UTC epoch arithmetic
    df = spark.createDataFrame(
        [("a", "1970-01-01 00:30:00"),   # Thu 0h
         ("a", "1970-01-01 23:10:00"),   # Thu 23h
         ("a", "1970-01-05 12:00:00"),   # Mon 12h
         ("b", "1970-01-04 06:00:00")],  # Sun 6h
        "k string, t string",
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    got = {(r["k"], r["dow"], r["hour"]): (r["n"], r["share"])
           for r in events.seasonality(df, "k", "t").collect()}
    assert got[("a", 4, 0)] == (1, 0.333333)
    assert got[("a", 4, 23)] == (1, 0.333333)
    assert got[("a", 1, 12)] == (1, 0.333333)
    assert got[("b", 7, 6)] == (1, 1.0)


def test_cusum_shift_detection_and_reference(spark):
    # flat first half, +1.5 shift second half: the whole-series mean
    # splits them, so BOTH sides walk up and alarm — while a per-bucket
    # 3-sigma rule (rolling band) sees no single spike anywhere
    rows = [("a", i, 10.0 + (i % 2) * 0.5) for i in range(10)]
    rows += [("a", i, 11.5 + (i % 2) * 0.5) for i in range(10, 20)]
    df = spark.createDataFrame(rows, "k string, b long, v double")
    got = {r["bucket"]: r for r in
           events.cusum(df, "k", "b", "v", k=0.5, h=3.0).collect()}
    assert got[9]["alarm"] and got[19]["alarm"]
    assert not got[0]["alarm"] and not got[13]["alarm"]
    # python reference with identical arithmetic
    import math

    vals = [v for _, _, v in rows]
    mvals = [round(v * 1e6) for v in vals]
    n, s, ss = len(mvals), sum(mvals), sum(m * m for m in mvals)
    mu = round(s / (n * 1e6), 6)
    sd = round(math.sqrt(max((n * ss - s * s) / (n * n) / 1e12, 0.0)), 6)
    sp = sn = 0.0
    for i, v in enumerate(vals):
        z = (v - mu) / sd
        sp = max(0.0, sp + z - 0.5)
        sn = max(0.0, sn - z - 0.5)
        assert got[i]["cusum_pos"] == round(sp, 6), i
        assert got[i]["cusum_neg"] == round(sn, 6), i


def test_cusum_constant_series_and_guards(spark):
    df = spark.createDataFrame(
        [("a", i, 5.0) for i in range(5)], "k string, b long, v double")
    rows = events.cusum(df, "k", "b", "v").collect()
    assert all(r["cusum_pos"] is None and r["alarm"] is None for r in rows)
    with pytest.raises(ValueError, match="k >= 0 and h > 0"):
        events.cusum(df, "k", "b", "v", k=-1)


def test_grid_consumers_max_cells_guard(spark):
    # rolling_stats and cusum collect_list per key: a raw event table
    # fed directly (instead of a resample grid) must RAISE the same
    # bounded pre-flight resample's max_periods does, not build an
    # unbounded per-key array inside one task
    df = spark.createDataFrame(
        [("a", i, float(i % 7)) for i in range(50)],
        "k string, b long, v double")
    with pytest.raises(ValueError, match="rolling_stats: a key holds 50"):
        events.rolling_stats(df, "k", "b", "v", window=3, max_cells=10)
    with pytest.raises(ValueError, match="cusum: a key holds 50"):
        events.cusum(df, "k", "b", "v", max_cells=10)
    # inside the bound both still work
    assert events.rolling_stats(df, "k", "b", "v", window=3,
                                max_cells=50).count() == 50
    assert events.cusum(df, "k", "b", "v", max_cells=50).count() == 50


def test_survival_km_reference(spark):
    # lifetimes 0, 1, 1, 2, 3 weeks; the 2- and 3-week users end within
    # one period of the corpus end -> right-censored, not churned
    def ts(day):
        return f"1970-01-{day:02d} 00:00:00"

    rows = [("u1", ts(1)), ("u1", ts(2)),
            ("u2", ts(1)), ("u2", ts(8)),
            ("u3", ts(2)), ("u3", ts(9)),
            ("u4", ts(1)), ("u4", ts(16)),
            ("u5", ts(1)), ("u5", ts(22))]
    df = spark.createDataFrame(rows, "u string, t string").select(
        "u", F.col("t").cast("timestamp").alias("t"))
    got = {r["period"]: r for r in
           events.survival(df, "u", "t", period_days=7,
                           horizon_periods=1).collect()}
    assert (got[0]["at_risk"], got[0]["churned"], got[0]["survival"]) == (5, 1, 0.8)
    assert (got[1]["at_risk"], got[1]["churned"], got[1]["survival"]) == (4, 2, 0.4)
    # censored-only periods hold S and shrink the risk set
    assert (got[2]["censored"], got[2]["survival"]) == (1, 0.4)
    assert (got[3]["at_risk"], got[3]["survival"]) == (1, 0.4)
    # partition invariance
    a = sorted(map(tuple, events.survival(df.repartition(1), "u", "t", 7, 1).collect()))
    b = sorted(map(tuple, events.survival(df.repartition(9), "u", "t", 7, 1).collect()))
    assert a == b
    with pytest.raises(ValueError, match="period_days"):
        events.survival(df, "u", "t", period_days=0)
    with pytest.raises(ValueError, match="span"):
        events.survival(df, "u", "t", period_days=1, max_periods=5)


def test_survival_by_groups(spark):
    def ts(day):
        return f"1970-01-{day:02d} 00:00:00"

    rows = [("u1", ts(1), "ads"), ("u1", ts(2), "organic"),
            ("u2", ts(1), "ads"), ("u2", ts(8), "ads"),
            ("u3", ts(1), "organic"), ("u3", ts(16), "organic"),
            ("u4", ts(1), "organic"), ("u4", ts(22), "organic"),
            ("u5", ts(1), None)]  # null group drops before attribution
    df = spark.createDataFrame(rows, "u string, t string, g string").select(
        "u", F.col("t").cast("timestamp").alias("t"), "g")
    got = {(r["g"], r["period"]): r for r in
           events.survival_by(df, "u", "t", "g", period_days=7,
                              horizon_periods=1).collect()}
    # u1's first event is "ads" (attribution = entry channel)
    assert got[("ads", 0)]["survival"] == 0.5
    assert got[("ads", 1)]["survival"] == 0.0
    # organic users are censored (their lifetimes reach the corpus end)
    assert got[("organic", 2)]["censored"] == 1
    assert got[("organic", 2)]["survival"] == 1.0
    assert ("None", 0) not in got and (None, 0) not in got


def test_ewma_reference_and_drift_detection(spark):
    # stable head, then a sharp 4-point ramp: the smoothed statistic
    # walks out of the band at the ramp's end (a pure two-level shift
    # never can — whole-series sigma absorbs it — so the fixture uses
    # a burst, which is also what EWMA charts are deployed against)
    rows = [("a", i, 10.0 + (i % 2) * 0.4) for i in range(20)]
    rows += [("a", 20 + j, 13.0 + j) for j in range(4)]
    df = spark.createDataFrame(rows, "k string, b long, v double")
    got = {r["bucket"]: r for r in
           events.ewma(df, "k", "b", "v", alpha=0.3, L=3.0).collect()}
    # python reference with identical arithmetic
    import math

    vals = [v for _, _, v in rows]
    mvals = [round(v * 1e6) for v in vals]
    n, s, ss = len(mvals), sum(mvals), sum(m * m for m in mvals)
    mu = round(s / (n * 1e6), 6)
    sd = round(math.sqrt(max((n * ss - s * s) / (n * n) / 1e12, 0.0)), 6)
    aa, ll = 0.3, 3.0
    e = mu
    for i, v in enumerate(vals):
        e = aa * v + (1.0 - aa) * e
        lm = ll * sd * math.sqrt(aa / (2.0 - aa) * (1.0 - (1.0 - aa) ** ((i + 1) * 2)))
        assert got[i]["ewma"] == round(e, 6), i
        assert got[i]["lo"] == round(mu - lm, 6), i
        assert got[i]["hi"] == round(mu + lm, 6), i
        assert got[i]["anomaly"] == (e < mu - lm or e > mu + lm), i
    # the shifted tail must alarm, the stable head must not
    assert got[23]["anomaly"] and not got[5]["anomaly"]


def test_ewma_constant_series_guard_and_validation(spark):
    df = spark.createDataFrame(
        [("a", i, 5.0) for i in range(5)], "k string, b long, v double")
    rows = events.ewma(df, "k", "b", "v").collect()
    # zero-width band around a constant: never alarms, ewma == mean
    assert all(r["ewma"] == 5.0 and not r["anomaly"] for r in rows)
    with pytest.raises(ValueError, match="alpha"):
        events.ewma(df, "k", "b", "v", alpha=0.0)
    with pytest.raises(ValueError, match="L must be"):
        events.ewma(df, "k", "b", "v", L=0.0)
    with pytest.raises(ValueError, match="ewma: a key holds 5"):
        events.ewma(df, "k", "b", "v", max_cells=3)


def test_acf_reference_and_period_detection(spark):
    import math

    # period-12 sine: strong positive acf at lag 12, negative at lag 6
    rows = [("a", i, 10.0 + 5.0 * math.sin(2 * math.pi * i / 12))
            for i in range(48)]
    df = spark.createDataFrame(rows, "k string, b long, v double")
    got = {r["lag"]: r for r in
           events.acf(df, "k", "b", "v", max_lag=13).collect()}
    assert got[12]["acf"] > 0.7 and got[6]["acf"] < -0.7
    assert got[1]["n_pairs"] == 47 and got[12]["n_pairs"] == 36
    # exact python mirror at lag 3 (integer micro sums, fixed order)
    mv = [round(v * 1e6) for _, _, v in rows]
    n, s, ss = len(mv), sum(mv), sum(m * m for m in mv)
    mu = s / (n * 1e6)
    k = 3
    s2 = sum(mv[i] * mv[i + k] for i in range(n - k))
    aa, bb = sum(mv[:n - k]), sum(mv[k:])
    num = s2 / 1e12 - mu * ((aa + bb) / 1e6) + (n - k) * mu * mu
    den = ss / 1e12 - n * mu * mu
    assert got[3]["acf"] == round(num / den, 6)


def test_acf_gaps_constant_and_validation(spark):
    # gap at b=2: lag-1 pairs exclude (1,2) and (2,3) -> only (0,1),(3,4)
    rows = [("a", b, float(b)) for b in (0, 1, 3, 4)]
    df = spark.createDataFrame(rows, "k string, b long, v double")
    got = {r["lag"]: r for r in
           events.acf(df, "k", "b", "v", max_lag=2).collect()}
    assert got[1]["n_pairs"] == 2  # (0,1) and (3,4)
    assert got[2]["n_pairs"] == 1  # only (1,3); 0+2 and 3+2 are gaps
    # constant series: zero variance -> NULL acf, pairs still counted
    dfc = spark.createDataFrame(
        [("c", b, 5.0) for b in range(6)], "k string, b long, v double")
    rows = events.acf(dfc, "k", "b", "v", max_lag=2).collect()
    assert all(r["acf"] is None for r in rows)
    with pytest.raises(ValueError, match="max_lag"):
        events.acf(dfc, "k", "b", "v", max_lag=0)
    with pytest.raises(ValueError, match="acf: a key holds"):
        events.acf(dfc, "k", "b", "v", max_cells=3)


def test_holt_reference_and_forecast(spark):
    rows = [("a", i, 10.0 + 2.0 * i + (i % 3) * 0.5) for i in range(12)]
    df = spark.createDataFrame(rows, "k string, b long, v double")
    got = events.holt_forecast(
        df, "k", "b", "v", alpha=0.4, beta=0.2, horizon=3,
    ).orderBy("bucket").collect()
    # python mirror: identical operation order
    aa, bb = 0.4, 0.2
    vals = [v for _, _, v in rows]
    l, tr = vals[0], vals[1] - vals[0]
    assert got[0]["level"] == round(l, 6)
    assert got[0]["trend"] == round(tr, 6)
    assert got[0]["forecast"] is None
    for t in range(1, len(vals)):
        fc = l + tr
        ln = aa * vals[t] + (1 - aa) * fc
        tr = bb * (ln - l) + (1 - bb) * tr
        l = ln
        assert got[t]["forecast"] == round(fc, 6), t
        assert got[t]["level"] == round(l, 6), t
        assert got[t]["trend"] == round(tr, 6), t
    # future rows: value/level/trend NULL, forecast extrapolates
    for h in (1, 2, 3):
        r = got[11 + h]
        assert r["bucket"] == 11 + h and r["value"] is None
        assert r["level"] is None and r["trend"] is None
        assert r["forecast"] == round(l + h * tr, 6)
    # a linear series forecasts nearly linearly upward
    assert got[-1]["forecast"] > got[11]["value"]


def test_holt_single_cell_horizon_zero_and_validation(spark):
    df = spark.createDataFrame([("a", 0, 7.0)], "k string, b long, v double")
    got = events.holt_forecast(df, "k", "b", "v", horizon=2).collect()
    assert len(got) == 3  # one observed + two flat future rows
    fut = sorted(got, key=lambda r: r["bucket"])[1:]
    assert all(r["forecast"] == 7.0 for r in fut)  # zero trend
    got = events.holt_forecast(df, "k", "b", "v", horizon=0).collect()
    assert len(got) == 1
    with pytest.raises(ValueError, match="alpha"):
        events.holt_forecast(df, "k", "b", "v", alpha=1.5)
    with pytest.raises(ValueError, match="beta"):
        events.holt_forecast(df, "k", "b", "v", beta=-0.1)
    with pytest.raises(ValueError, match="horizon"):
        events.holt_forecast(df, "k", "b", "v", horizon=-1)
    with pytest.raises(ValueError, match="holt_forecast: a key holds"):
        events.holt_forecast(
            spark.createDataFrame(
                [("a", i, 1.0) for i in range(9)],
                "k string, b long, v double"),
            "k", "b", "v", max_cells=4)


def test_acf_and_holt_directives(spark):
    from wrangler_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(8)],
        "k string, b long, v double")
    out = Pipeline.compile("acf :k :b :v 3").apply(df)
    assert out.count() == 3
    out = Pipeline.compile("holt-forecast :k :b :v 0.5 0.1 2").apply(df)
    assert out.count() == 10
