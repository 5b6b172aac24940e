"""Structured Streaming: same compiled recipe over readStream, windowed
aggregation, streaming dedup."""

import shutil

import pytest

from pyspark.sql import functions as F

from wrangler_spark import Pipeline
from wrangler_spark.streaming import run_to_memory, streaming_dedup, transform_stream, windowed_agg


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    df = spark.createDataFrame(
        [(1, "alice,30"), (2, "bob,25"), (3, "carol,35"), (3, "carol,35")],
        ["id", "body"],
    )
    df.write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_recipe_on_stream(spark, stream_dir):
    static = spark.read.parquet(stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(stream_dir)
    p = Pipeline.compile(
        "parse-as-csv :body ',' false\ndrop :body\nset-headers :rid,:name,:age\nset-type :age int\nuppercase :name"
    )
    result = transform_stream(p, stream, sample_df=static)
    q = run_to_memory(result.df, "recipe_out")
    rows = spark.sql("SELECT * FROM recipe_out ORDER BY rid, name").collect()
    q.stop()
    assert len(rows) == 4
    assert rows[0]["name"] == "ALICE" and rows[0]["age"] == 30


def test_recipe_on_stream_requires_sample(spark, stream_dir):
    static = spark.read.parquet(stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(stream_dir)
    p = Pipeline.compile("parse-as-csv :body ',' false")
    from wrangler_spark.errors import DirectiveApplyError

    with pytest.raises(DirectiveApplyError, match="streaming"):
        transform_stream(p, stream)


def test_streaming_dedup(spark, stream_dir):
    static = spark.read.parquet(stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(stream_dir)
    q = run_to_memory(streaming_dedup(stream, ["id", "body"]), "dedup_out")
    n = spark.sql("SELECT count(*) c FROM dedup_out").collect()[0]["c"]
    q.stop()
    assert n == 3  # the duplicate (3, carol) row collapsed


def test_windowed_agg(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ts_src"))
    rows = [(i, f"2024-01-01 00:{i:02d}:00", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "ts_s", "v"]).withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    df.write.mode("overwrite").parquet(d)
    static = spark.read.parquet(d)
    stream = spark.readStream.schema(static.schema).parquet(d)
    agg = windowed_agg(
        stream, "ts", "5 minutes",
        {"n": F.count("*"), "total": F.sum("v")},
        watermark="1 minute",
    )
    q = run_to_memory(agg, "win_out", output_mode="complete")
    out = {r["window_start"].minute: (r["n"], r["total"]) for r in spark.sql("SELECT * FROM win_out").collect()}
    q.stop()
    assert out[0] == (5, 10.0)   # minutes 0-4
    assert out[5] == (5, 35.0)   # minutes 5-9
    shutil.rmtree(d, ignore_errors=True)


def test_error_channel_on_stream(spark, stream_dir):
    static = spark.read.parquet(stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(stream_dir)
    p = Pipeline.compile("send-to-error exp:{ id > 2 } 'big id'")
    result = transform_stream(p, stream, sample_df=static)
    q1 = run_to_memory(result.df, "clean_out")
    q1.stop()
    assert spark.sql("SELECT count(*) c FROM clean_out").collect()[0]["c"] == 2


def test_errors_side_on_stream(spark, stream_dir):
    static = spark.read.parquet(stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(stream_dir)
    p = Pipeline.compile("send-to-error exp:{ id > 2 } 'big id'")
    result = transform_stream(p, stream, sample_df=static)
    q = run_to_memory(result.errors(), "err_out")
    q.stop()
    rows = spark.sql("SELECT * FROM err_out").collect()
    assert len(rows) == 2  # the two (3, carol) rows
    assert all(r["message"] == "big id" for r in rows)


def test_sessionize_batch(spark):
    from wrangler_spark.streaming.sessions import sessionize

    rows = [
        ("u1", "2024-01-01 00:00:00"),
        ("u1", "2024-01-01 00:10:00"),   # same session (10 min gap)
        ("u1", "2024-01-01 01:00:00"),   # new session (50 min > 30)
        ("u2", "2024-01-01 00:05:00"),   # u2 single-event session
    ]
    df = spark.createDataFrame(rows, ["user", "ts_s"]).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = {(r["user"], r["session_id"]): (r["n_events"], r["session_start"].minute, r["session_end"].minute)
           for r in sessionize(df, "user", "ts", gap_minutes=30).collect()}
    assert out[("u1", 1)] == (2, 0, 10)
    assert out[("u1", 2)] == (1, 0, 0)
    assert out[("u2", 1)] == (1, 5, 5)


def test_sessionize_stream(spark, tmp_path_factory):
    from wrangler_spark.streaming.sessions import sessionize_stream

    d = str(tmp_path_factory.mktemp("sess_src"))
    rows = [
        ("u1", "2024-01-01 00:00:00"),
        ("u1", "2024-01-01 00:10:00"),
        ("u1", "2024-01-01 01:00:00"),   # closes session 1 in-batch (50 min gap)
        ("u2", "2024-01-01 00:05:00"),
    ]
    df = spark.createDataFrame(rows, ["user", "ts_s"]).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    df.write.mode("overwrite").parquet(d)
    static = spark.read.parquet(d)
    stream = spark.readStream.schema(static.schema).parquet(d)
    q = run_to_memory(sessionize_stream(stream, "user", "ts", gap_minutes=30), "sess_out", timeout=90)
    rows_out = spark.sql("SELECT * FROM sess_out").collect()
    q.stop()
    # only u1's first session closes (gap observed in-batch); open sessions
    # stay in state until event-time timeout
    assert len(rows_out) == 1
    r = rows_out[0]
    assert r["key"] == "u1" and r["n_events"] == 2
    assert r["session_start"].minute == 0 and r["session_end"].minute == 10
    shutil.rmtree(d, ignore_errors=True)


def test_curation_recipe_on_stream(spark, tmp_path_factory):
    """The round-3 curation directives are stateless per record, so they
    run on a stream unchanged — quality flags + PII scrub + hash sampling
    as one streaming recipe."""
    import shutil as _sh

    d = str(tmp_path_factory.mktemp("cur_src"))
    rows = [
        (1, "write to admin@example.com " + "the be to of and that have with word " * 8),
        (2, "short"),
        (3, "no pii here " + "the be to of and that have with word " * 8),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.write.mode("overwrite").parquet(d)
    static = spark.read.parquet(d)
    stream = spark.readStream.schema(static.schema).parquet(d)
    p = Pipeline.compile("pii-redact :text\ngopher-quality :text\nsample-hash :doc_id 1.0")
    result = transform_stream(p, stream, sample_df=static)
    q = run_to_memory(result.df, "cur_out")
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM cur_out").collect()}
    q.stop()
    assert got[1]["n_pii_email"] == 1 and "<EMAIL>" in got[1]["text"]
    assert got[2]["g_word_count"] is False
    assert got[3]["n_pii"] == 0 and got[3]["g_stopwords"] is True
    _sh.rmtree(d, ignore_errors=True)


def test_streaming_near_dedup(spark, tmp_path_factory):
    import shutil as _sh

    from wrangler_spark.streaming import streaming_near_dedup

    d = str(tmp_path_factory.mktemp("near_src"))
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "THE  quick   Brown fox jumps over the lazy dog"),  # normalized dup
        (4, "completely different content about spark engines and shuffles"),
    ]
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    try:
        static = spark.read.parquet(d)
        stream = spark.readStream.schema(static.schema).parquet(d)
        q = run_to_memory(streaming_near_dedup(stream, "text"), "near_out")
        got = spark.sql("SELECT doc_id, simhash FROM near_out").collect()
        q.stop()
        # the three identical-after-normalization docs collapse to one
        # survivor; the distinct doc stays; simhash column rides along
        ids = sorted(r["doc_id"] for r in got)
        assert len(ids) == 2 and 4 in ids and ids[0] in (1, 2, 3)
        assert all(r["simhash"] is not None for r in got)
        # batch form: same semantics on a static frame
        b = streaming_near_dedup(static, "text")
        assert b.count() == 2
    finally:
        _sh.rmtree(d, ignore_errors=True)


def test_exact_dedup_against_on_stream(spark, tmp_path_factory):
    """Incremental exact dedup is stream-safe as-is: the batch operator's
    stream-static left join (streaming new batch vs the accumulated static
    key set) runs unchanged under Structured Streaming — the production
    ingestion shape (readStream the landing zone, join the corpus keys)."""
    import shutil

    from wrangler_spark.datapipe.dedup import exact_dedup_against

    d = str(tmp_path_factory.mktemp("ingest_src"))
    new = spark.createDataFrame(
        [(1, "seen before text"), (2, "brand new text"), (3, "also seen text")],
        ["doc_id", "text"],
    )
    new.write.mode("overwrite").parquet(d)
    old = spark.createDataFrame(
        [(100, "SEEN  before   text"), (101, "also seen text"), (102, "other")],
        ["doc_id", "text"],
    )
    stream = spark.readStream.schema(new.schema).parquet(d)
    flags = exact_dedup_against(stream, old, "doc_id", "text")
    assert flags.isStreaming
    q = run_to_memory(flags, "cross_flags")
    got = {r["doc_id"]: r["is_dup"] for r in spark.sql("SELECT * FROM cross_flags").collect()}
    q.stop()
    shutil.rmtree(d, ignore_errors=True)
    assert got == {1: True, 2: False, 3: True}


def test_entity_match_against_on_stream(spark, tmp_path_factory):
    """Cross-corpus fuzzy matching is stream-safe: the new side is
    scan-side (key projection + explode), the old side collapses to a
    STATIC per-block list frame, so the whole op is stream-static
    equi-joins — reconcile a streaming ingestion source against the
    master corpus without code changes."""
    import shutil

    from wrangler_spark.datapipe.dedup import entity_match_against

    d = str(tmp_path_factory.mktemp("em_src"))
    new = spark.createDataFrame(
        [(1, "Acme Corp.", "NY"), (2, "Zed Ltd", "NY"), (3, "Acme Corp", None)],
        ["cid", "name", "state"],
    )
    new.write.mode("overwrite").parquet(d)
    old = spark.createDataFrame(
        [(100, "Acme Corp", "NY"), (101, "Other Inc", "NY"), (102, "Acme Corp", "CA")],
        ["cid", "name", "state"],
    )
    stream = spark.readStream.schema(new.schema).parquet(d)
    pairs = entity_match_against(stream, old, "cid", ["state"], [("name", 2)])
    assert pairs.isStreaming
    q = run_to_memory(pairs, "em_pairs")
    got = {(r["id_new"], r["id_old"]): r["name_dist"]
           for r in spark.sql("SELECT * FROM em_pairs").collect()}
    q.stop()
    shutil.rmtree(d, ignore_errors=True)
    # batch mode gives identical pairs
    batch = {(r["id_new"], r["id_old"]): r["name_dist"]
             for r in entity_match_against(new, old, "cid", ["state"], [("name", 2)]).collect()}
    assert got == batch == {(1, 100): 1}


def test_streaming_near_dedup_against(spark, tmp_path_factory):
    """Streaming docs whose SimHash bucket exists in the static corpus are
    flagged; fresh content passes. Batch mode gives identical flags.
    prefix_bits=14 here: the one-word change flips a bit inside the top
    16 of this pair's simhash, which is exactly the granularity knob the
    docstring documents (raise to split more, lower to collapse more)."""
    import shutil

    from wrangler_spark.streaming import streaming_near_dedup_against

    d = str(tmp_path_factory.mktemp("near_ingest"))
    new = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "totally novel writing about unrelated topics entirely")],
        ["doc_id", "text"],
    )
    new.write.mode("overwrite").parquet(d)
    old = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy cat")],  # near-dup of 1
        ["doc_id", "text"],
    )
    stream = spark.readStream.schema(new.schema).parquet(d)
    flagged = streaming_near_dedup_against(stream, old, "text", prefix_bits=14)
    assert flagged.isStreaming
    q = run_to_memory(flagged, "near_flags")
    got = {r["doc_id"]: r["is_dup"] for r in spark.sql("SELECT * FROM near_flags").collect()}
    q.stop()
    shutil.rmtree(d, ignore_errors=True)
    assert got == {1: True, 2: False}
    batch = {r["doc_id"]: r["is_dup"] for r in
             streaming_near_dedup_against(new, old, "text", prefix_bits=14).collect()}
    assert batch == got


def test_ingest_monitor(spark, tmp_path_factory):
    """Windowed dup-rate against the accumulated corpus, on a real
    stream; batch mode agrees."""
    import datetime
    import shutil

    from wrangler_spark.streaming import ingest_monitor

    d = str(tmp_path_factory.mktemp("mon_src"))
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, "known text a"), (2, t0, "fresh text b"),
        (3, t0 + datetime.timedelta(minutes=1), "known text c"),
        (4, t0 + datetime.timedelta(minutes=1), "fresh text d"),
        (5, t0 + datetime.timedelta(minutes=1), "KNOWN  text a"),
    ]
    new = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    new.write.mode("overwrite").parquet(d)
    old = spark.createDataFrame(
        [(100, "known text a"), (101, "known text c")], ["doc_id", "text"]
    )
    stream = spark.readStream.schema(new.schema).parquet(d)
    mon = ingest_monitor(stream, old, "ts", "text", window="1 minute")
    q = run_to_memory(mon, "mon_out", output_mode="complete")
    got = {r["window_start"].minute: (r["n_docs"], r["n_dups"]) for r in
           spark.sql("SELECT * FROM mon_out").collect()}
    q.stop()
    shutil.rmtree(d, ignore_errors=True)
    assert got == {0: (2, 1), 1: (3, 2)}
    batch = {r["window_start"].minute: (r["n_docs"], r["n_dups"]) for r in
             ingest_monitor(new, old, "ts", "text", window="1 minute").collect()}
    assert batch == got


def test_bloom_dedup_against_on_stream(spark, tmp_path_factory):
    """The Bloom pre-filter path is stream-safe too: the sparse bitmap is
    a STATIC frame (checkpointed at plan time from the accumulated
    corpus), the probe is stream-static broadcast joins, and the
    positive/negative branches union back — same flags as the plain
    path, scan-side for the ~all-clean streaming batch."""
    import shutil

    from wrangler_spark.datapipe.dedup import exact_dedup_against

    d = str(tmp_path_factory.mktemp("ingest_src_bloom"))
    new = spark.createDataFrame(
        [(1, "seen before text"), (2, "brand new text"), (3, "also seen text")],
        ["doc_id", "text"],
    )
    new.write.mode("overwrite").parquet(d)
    old = spark.createDataFrame(
        [(100, "SEEN  before   text"), (101, "also seen text"), (102, "other")],
        ["doc_id", "text"],
    )
    stream = spark.readStream.schema(new.schema).parquet(d)
    flags = exact_dedup_against(stream, old, "doc_id", "text", bloom_bits=1 << 16)
    assert flags.isStreaming
    q = run_to_memory(flags, "bloom_flags")
    got = {r["doc_id"]: r["is_dup"] for r in spark.sql("SELECT * FROM bloom_flags").collect()}
    q.stop()
    shutil.rmtree(d, ignore_errors=True)
    assert got == {1: True, 2: False, 3: True}


def test_funnel_stream_matches_batch(spark, tmp_path_factory):
    """Stream funnel == batch funnel on in-order data: per-step user
    counts agree, and the strict-order / within-anchor rules carry over
    (u2's b at the same instant as a does not advance; u3's b is outside
    the 60-min anchor window)."""
    import shutil as _sh

    from wrangler_spark.datapipe.events import funnel_steps
    from wrangler_spark.streaming.funnels import funnel_stream

    d = str(tmp_path_factory.mktemp("funnel_src"))
    rows = [
        ("u1", "2024-01-01 00:00:00", "a"),
        ("u1", "2024-01-01 00:10:00", "b"),
        ("u2", "2024-01-01 00:00:00", "a"),
        ("u2", "2024-01-01 00:00:00", "b"),   # same instant: no advance
        ("u3", "2024-01-01 00:00:00", "a"),
        ("u3", "2024-01-01 02:00:00", "b"),   # outside 60-min anchor window
        ("u4", "2024-01-01 00:30:00", "b"),   # b before any a: stuck
    ]
    df = (
        spark.createDataFrame(rows, ["user", "ts_s", "etype"])
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    )
    df.write.mode("overwrite").parquet(d)
    static = spark.read.parquet(d)
    stream = spark.readStream.schema(static.schema).parquet(d)
    q = run_to_memory(
        funnel_stream(stream, "user", "ts", "etype", ["a", "b"], within_minutes=60),
        "funnel_out", timeout=90,
    )
    out = spark.sql("SELECT * FROM funnel_out").collect()
    q.stop()
    stream_counts = {}
    for r in out:
        stream_counts[r["step"]] = stream_counts.get(r["step"], 0) + 1
    batch = funnel_steps(static, "user", "ts", "etype", ["a", "b"], within_minutes=60)
    batch_counts = {r["step"]: r["users"] for r in batch.collect() if r["users"]}
    assert stream_counts == batch_counts == {1: 3, 2: 1}
    # the emitted fill rows carry the greedy chain timestamps
    fills = {(r["key"], r["step"]): r["step_ts"] for r in out}
    assert fills[("u1", 2)].minute == 10
    _sh.rmtree(d, ignore_errors=True)


def test_transitions_stream_matches_batch(spark, tmp_path_factory):
    """Streamed pair emission aggregates to the batch transition matrix
    on in-order data, including pairs that SPAN micro-batch boundaries
    (state carries the last event across batches)."""
    import shutil as _sh

    from wrangler_spark.datapipe.events import event_transitions
    from wrangler_spark.streaming.funnels import transitions_stream

    d = str(tmp_path_factory.mktemp("trans_src"))
    rows = [
        ("u1", "2024-01-01 00:00:00", "a"),
        ("u1", "2024-01-01 00:10:00", "b"),
        ("u1", "2024-01-01 00:20:00", "a"),
        ("u2", "2024-01-01 00:00:00", "b"),
        ("u2", "2024-01-01 00:05:00", "a"),
        ("u3", "2024-01-01 00:00:00", "a"),  # single event: no pair
    ]
    df = (
        spark.createDataFrame(rows, ["user", "ts_s", "etype"])
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    )
    df.write.mode("overwrite").parquet(d)
    static = spark.read.parquet(d)
    stream = spark.readStream.schema(static.schema).parquet(d)
    q = run_to_memory(
        transitions_stream(stream, "user", "ts", "etype"), "trans_out", timeout=90
    )
    out = spark.sql("SELECT * FROM trans_out").collect()
    q.stop()
    stream_counts = {}
    for r in out:
        k = (r["from_type"], r["to_type"])
        stream_counts[k] = stream_counts.get(k, 0) + 1
    batch = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in event_transitions(static, "user", "ts", "etype").collect()
    }
    assert stream_counts == batch == {("a", "b"): 1, ("b", "a"): 2}
    _sh.rmtree(d, ignore_errors=True)


def test_embedding_pairs_against_on_stream(spark, tmp_path_factory):
    """Cross-corpus SEMANTIC near-dedup is stream-safe: the new side's
    hyperplane signature is scan-side, the old side collapses to static
    bucket/vector frames, so the op is two stream-static equi-joins —
    semantic decontamination of a streaming ingestion source against a
    static benchmark corpus, no code changes. Batch mode gives
    identical pairs."""
    import random
    import shutil

    from wrangler_spark.datapipe import dedup

    rng = random.Random(5)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    new = spark.createDataFrame(
        [(1, [x * 1.001 for x in base]),
         (2, [rng.uniform(-1, 1) for _ in range(16)])],
        ["vec_id", "embedding"],
    )
    old = spark.createDataFrame(
        [(100, base), (101, [rng.uniform(-1, 1) for _ in range(16)])],
        ["vec_id", "embedding"],
    )
    d = str(tmp_path_factory.mktemp("emb_ingest"))
    new.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(new.schema).parquet(d)
    planes = dedup.HYPERPLANES[:8]
    pairs = dedup.embedding_pairs_against(
        stream, old, "vec_id", "embedding", 0.9, planes=planes
    )
    assert pairs.isStreaming
    q = run_to_memory(pairs, "emb_cross")
    got = {(r["id_new"], r["id_old"]): r["cosine"]
           for r in spark.sql("SELECT * FROM emb_cross").collect()}
    q.stop()
    shutil.rmtree(d, ignore_errors=True)
    batch = {(r["id_new"], r["id_old"]): r["cosine"]
             for r in dedup.embedding_pairs_against(
                 new, old, "vec_id", "embedding", 0.9, planes=planes).collect()}
    assert got == batch and (1, 100) in got


def test_read_warc_streaming(spark, tmp_path_factory):
    """Crawl drops landing in a directory stream through the same WARC
    parse path (binaryFile file source, schema pinned) and compose with
    the incremental dedup: new pages are flagged against the accumulated
    static corpus per micro-batch."""
    import gzip
    import shutil

    from wrangler_spark.datapipe.dedup import exact_dedup_against
    from wrangler_spark.formats import warc
    from wrangler_spark.sources import read_warc

    d = str(tmp_path_factory.mktemp("crawl_drop"))
    recs = []
    for i, body in ((1, b"seen before page"), (2, b"genuinely new page")):
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        recs.append(warc.build_record(
            {"WARC-Record-ID": f"<urn:uuid:{i}>", "WARC-Target-URI": f"http://x/{i}",
             "Content-Type": "application/http; msgtype=response"}, http))
    with open(f"{d}/drop0.warc.gz", "wb") as fh:
        fh.write(gzip.compress(b"".join(recs)))

    pages = read_warc(spark, d, record_types=("response",), streaming=True)
    assert pages.isStreaming
    corpus = spark.createDataFrame([(100, "SEEN  before   page")], ["doc_id", "text"])
    flags = exact_dedup_against(
        pages.selectExpr("target_uri AS doc_id", "CAST(payload AS STRING) AS text"),
        corpus, "doc_id", "text",
    )
    q = run_to_memory(flags, "crawl_flags")
    got = {r["doc_id"]: r["is_dup"] for r in spark.sql("SELECT * FROM crawl_flags").collect()}
    q.stop()
    shutil.rmtree(d, ignore_errors=True)
    assert got == {"http://x/1": True, "http://x/2": False}


def test_interval_join_stream_matches_batch(spark, tmp_path_factory):
    """Watermarked stream-stream interval join (click attribution):
    inner-join results equal the identical-condition batch join."""
    import shutil as _sh

    from wrangler_spark.streaming import interval_join_stream

    imp_rows = [
        (1, "u1", "2024-01-01 10:00:00"),
        (2, "u1", "2024-01-01 10:40:00"),
        (3, "u2", "2024-01-01 09:00:00"),
        (4, "u3", "2024-01-01 12:00:00"),
    ]
    clk_rows = [
        (101, "u1", "2024-01-01 10:30:00"),  # attributes to imp 1 (30m) only
        (102, "u2", "2024-01-01 09:59:00"),  # attributes to imp 3 (59m)
        (103, "u3", "2024-01-01 13:30:00"),  # outside 1h of imp 4 -> no match
    ]
    di = str(tmp_path_factory.mktemp("imp"))
    dc = str(tmp_path_factory.mktemp("clk"))
    imp = spark.createDataFrame(imp_rows, ["imp_id", "user", "imp_ts"]).select(
        "imp_id", "user", F.col("imp_ts").cast("timestamp").alias("imp_ts"))
    clk = spark.createDataFrame(clk_rows, ["click_id", "user", "click_ts"]).select(
        "click_id", "user", F.col("click_ts").cast("timestamp").alias("click_ts"))
    imp.coalesce(1).write.mode("overwrite").parquet(di)
    clk.coalesce(1).write.mode("overwrite").parquet(dc)
    try:
        si = spark.readStream.schema(imp.schema).parquet(di)
        sc = spark.readStream.schema(clk.schema).parquet(dc)
        joined = interval_join_stream(
            si, sc, "user", "imp_ts", "click_ts", upper="1 hour",
        ).select("imp_id", "click_id")
        q = run_to_memory(joined, "attrib_out")
        got = sorted(map(tuple, spark.sql("SELECT imp_id, click_id FROM attrib_out").collect()))
        q.stop()
        want = sorted(map(tuple, imp.alias("l").join(
            clk.alias("r"),
            (F.col("l.user") == F.col("r.user"))
            & (F.col("l.imp_ts") >= F.expr("r.click_ts - INTERVAL 1 hour"))
            & (F.col("l.imp_ts") <= F.expr("r.click_ts - INTERVAL 0 seconds")),
        ).select("imp_id", "click_id").collect()))
        assert got == want == [(1, 101), (3, 102)]
    finally:
        _sh.rmtree(di, ignore_errors=True)
        _sh.rmtree(dc, ignore_errors=True)


def test_interval_join_stream_guards(spark):
    import pytest as _pytest

    from wrangler_spark.streaming import interval_join_stream

    static = spark.createDataFrame([(1, "u", "2024-01-01")], ["i", "user", "ts"])
    with _pytest.raises(ValueError, match="STREAMING"):
        interval_join_stream(static, static, "user", "ts", "ts")


def test_session_stats(spark):
    from pyspark.sql import functions as F

    from wrangler_spark.streaming.sessions import session_stats

    # u1: one 2-event session (10 min) + one bounce; u2: one bounce
    df = spark.createDataFrame(
        [("u1", "1970-01-01 00:00:00"), ("u1", "1970-01-01 00:10:00"),
         ("u1", "1970-01-01 02:00:00"), ("u2", "1970-01-01 05:00:00")],
        "user_id string, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    r = session_stats(df, "user_id", "ts", 30.0).collect()[0]
    assert r["n_sessions"] == 3 and r["n_users"] == 2
    assert r["avg_events"] == 1.333333
    assert r["avg_duration_sec"] == 200.0    # (600 + 0 + 0) / 3
    assert r["p50_duration_sec"] == 0.0
    assert r["bounce_rate"] == 0.666667
    # exact=False: bounded-memory approx median (the funnel_latencies
    # knob) — on 3 values the sketch is exact, everything else equal
    ra = session_stats(df, "user_id", "ts", 30.0, exact=False).collect()[0]
    assert ra["p50_duration_sec"] == 0.0
    assert ra["n_sessions"] == 3 and ra["avg_duration_sec"] == 200.0


def test_session_stats_by_arms(spark):
    # per-arm scorecard: anchor-event attribution, per-group rows;
    # arm totals == the ungrouped scorecard's session count
    from pyspark.sql import functions as F

    from wrangler_spark.streaming.sessions import session_stats, session_stats_by

    rows = [
        # arm A: u1 has a 2-event session + a bounce
        ("u1", "1970-01-01 00:00:00", "A"), ("u1", "1970-01-01 00:10:00", "A"),
        ("u1", "1970-01-01 02:00:00", "A"),
        # arm B: u2 one bounce; u3 one 2-event session
        ("u2", "1970-01-01 05:00:00", "B"),
        ("u3", "1970-01-01 06:00:00", "B"), ("u3", "1970-01-01 06:05:00", "B"),
        # unlabeled user: drops (NULL never attributes)
        ("u4", "1970-01-01 07:00:00", None),
    ]
    df = spark.createDataFrame(rows, "u string, t string, g string").select(
        "u", F.col("t").cast("timestamp").alias("t"), "g")
    got = {r["g"]: r for r in session_stats_by(df, "u", "t", "g").collect()}
    assert set(got) == {"A", "B"}
    assert got["A"]["n_sessions"] == 2 and got["A"]["n_users"] == 1
    assert got["A"]["bounce_rate"] == 0.5
    assert got["B"]["n_sessions"] == 2 and got["B"]["n_users"] == 2
    assert got["B"]["avg_duration_sec"] == 150.0     # (0 + 300) / 2
    total = session_stats(
        df.filter(F.col("g").isNotNull()), "u", "t").collect()[0]
    assert got["A"]["n_sessions"] + got["B"]["n_sessions"] == total["n_sessions"]
    # directive form
    from wrangler_spark.pipeline import Pipeline

    d = Pipeline.compile("session-stats-by :u :t :g").apply(df)
    assert {r["g"]: r["n_sessions"] for r in d.collect()} == {"A": 2, "B": 2}


def test_session_family_timestamp_ntz(spark):
    # parquet commonly surfaces TIMESTAMP_NTZ; unix_micros rejects it
    # with a type error while every other time function coerces — the
    # session/funnel family must accept NTZ columns directly (the
    # _umicros cast), with identical results to the tz-aware form
    from pyspark.sql import functions as F

    from wrangler_spark.streaming.sessions import session_stats, sessionize

    rows = [("u1", "1970-01-01 00:00:00"), ("u1", "1970-01-01 00:10:00"),
            ("u1", "1970-01-01 02:00:00"), ("u2", "1970-01-01 05:00:00")]
    base = spark.createDataFrame(rows, "user_id string, ts string")
    tz = base.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    ntz = base.select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    key = lambda r: (r["user_id"], r["session_id"], str(r["session_start"]),  # noqa: E731
                     str(r["session_end"]), r["n_events"])
    assert sorted(map(key, sessionize(ntz, "user_id", "ts").collect())) == \
        sorted(map(key, sessionize(tz, "user_id", "ts").collect()))
    a = session_stats(ntz, "user_id", "ts").collect()[0]
    b = session_stats(tz, "user_id", "ts").collect()[0]
    assert a.asDict() == b.asDict()


def test_chunk_and_code_signals_on_stream(spark, tmp_path_factory):
    # both ops are stateless map-side transforms — they must run on a
    # stream UNCHANGED (no aggregation, no watermark needed) and agree
    # with their batch output row-for-row
    import shutil

    from wrangler_spark.datapipe.curation import chunk_documents
    from wrangler_spark.datapipe.text import code_signals

    d = str(tmp_path_factory.mktemp("chunk_stream"))
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "def f():\n    return 1\n    pass")],
        ["doc_id", "text"],
    )
    docs.write.mode("overwrite").parquet(d)
    static = spark.read.parquet(d)
    stream = spark.readStream.schema(static.schema).parquet(d)

    q = run_to_memory(chunk_documents(stream, "doc_id", "text", 4, 1), "chunks_out")
    got = spark.sql(
        "SELECT * FROM chunks_out ORDER BY doc_id, chunk_id").collect()
    q.stop()
    want = chunk_documents(static, "doc_id", "text", 4, 1).orderBy(
        "doc_id", "chunk_id").collect()
    assert got == want and len(got) > 2

    q2 = run_to_memory(code_signals(stream, "text"), "code_out")
    got2 = spark.sql("SELECT * FROM code_out ORDER BY doc_id").collect()
    q2.stop()
    want2 = code_signals(static, "text").orderBy("doc_id").collect()
    assert got2 == want2
    assert got2[1]["is_code"] and not got2[0]["is_code"]
    shutil.rmtree(d, ignore_errors=True)
