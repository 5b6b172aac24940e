"""WARC/WET source + html-to-text extraction (the Common Crawl front end)."""

import gzip

from wrangler_spark.formats import warc
from wrangler_spark.sources import read_warc


def _http_block(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    )


def _fixture_bytes() -> bytes:
    """warcinfo + 2 responses + 1 WET conversion record."""
    recs = [
        warc.build_record(
            {"WARC-Record-ID": "<urn:uuid:info>", "Content-Type": "application/warc-fields"},
            b"software: test\r\n",
            warc_type="warcinfo",
        ),
        warc.build_record(
            {
                "WARC-Record-ID": "<urn:uuid:r1>",
                "WARC-Target-URI": "http://example.com/a",
                "WARC-Date": "2026-01-01T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            _http_block(b"<html><body><p>Hello &amp; welcome</p></body></html>"),
        ),
        warc.build_record(
            {
                "WARC-Record-ID": "<urn:uuid:r2>",
                "WARC-Target-URI": "http://example.com/b",
                "WARC-Date": "2026-01-01T00:00:01Z",
                "Content-Type": "application/http; msgtype=response",
            },
            _http_block(b"<html><script>bad()</script><h1>Title</h1>page two</html>", 404),
        ),
        warc.build_record(
            {
                "WARC-Record-ID": "<urn:uuid:w1>",
                "WARC-Target-URI": "http://example.com/a",
                "Content-Type": "text/plain",
            },
            b"Hello extracted text",
            warc_type="conversion",
        ),
    ]
    return b"".join(recs)


def test_iter_records_plain_and_gzip_variants():
    raw = _fixture_bytes()
    got_plain = list(warc.iter_records(raw))
    assert len(got_plain) == 4
    assert got_plain[0][0]["warc-type"] == "warcinfo"
    assert got_plain[3][1] == b"Hello extracted text"

    # whole-stream gzip AND the archival per-record-member convention
    whole = gzip.compress(raw)
    per_record = b"".join(
        gzip.compress(warc.build_record({"WARC-Record-ID": f"<urn:uuid:{i}>"}, b"x" * i))
        for i in range(1, 4)
    )
    assert [h["warc-record-id"] for h, _ in warc.iter_records(whole)] == [
        h["warc-record-id"] for h, _ in got_plain
    ]
    assert [len(b) for _, b in warc.iter_records(per_record)] == [1, 2, 3]

    # truncated tail record is dropped, not raised
    cut = raw[: len(raw) - 10]
    assert len(list(warc.iter_records(cut))) == 3


def test_iter_records_peak_memory_is_one_record():
    """The scale contract of the gzip path: peak parse-buffer bytes are
    bounded by ONE record (+ fixed chunk slack), never the decompressed
    archive — for the per-record-member convention AND whole-stream
    gzip. 64 records x 256 KiB = 16 MiB decompressed; the buffer must
    stay under one record + the 1 MiB chunk slack."""
    rec_body = b"x" * (256 * 1024)
    recs = [
        warc.build_record({"WARC-Record-ID": f"<r{i}>"}, rec_body)
        for i in range(64)
    ]
    one_record = len(recs[0])
    for blob in (
        b"".join(gzip.compress(r) for r in recs),  # per-record members
        gzip.compress(b"".join(recs)),             # whole-stream gzip
    ):
        wm = [0]
        got = list(warc.iter_records(blob, _watermark=wm))
        assert len(got) == 64 and all(b == rec_body for _, b in got)
        assert wm[0] <= one_record + warc._MAX_CHUNK, (
            f"peak buffer {wm[0]} exceeds one record + chunk slack "
            f"({one_record} + {warc._MAX_CHUNK}) — decompressed archive "
            f"is {sum(map(len, recs))}"
        )

    # truncated gzip tail: records that decoded cleanly are kept, the
    # partial tail record is dropped (the plain-file contract)
    blob = b"".join(gzip.compress(r) for r in recs[:4])
    assert len(list(warc.iter_records(blob[: len(blob) - 40]))) == 3

    # a long marker-free junk run between records is trimmed while
    # scanning, not accumulated — resync still lands on the next record
    # (the boundary marker is "\nWARC/", so the junk must end in a
    # newline to be recoverable at all — same contract as _resync)
    junk = bytes(range(65, 91)) * (1 << 18) + b"\r\n"  # 6.8 MB, no \nWARC/
    wm = [0]
    got = list(
        warc.iter_records(
            b"".join(gzip.compress(b) for b in (recs[0], junk, recs[1])),
            _watermark=wm,
        )
    )
    assert [h["warc-record-id"] for h, _ in got] == ["<r0>", "<r1>"]
    assert wm[0] <= one_record + 2 * warc._MAX_CHUNK  # junk never piles up


def test_split_http_payload():
    status, body = warc.split_http_payload(_http_block(b"payload", 301))
    assert (status, body) == (301, b"payload")
    # non-HTTP block untouched
    status, body = warc.split_http_payload(b"plain bytes")
    assert status is None and body == b"plain bytes"


def test_read_warc_spark(spark, tmp_path):
    (tmp_path / "a.warc.gz").write_bytes(gzip.compress(_fixture_bytes()))
    (tmp_path / "b.warc").write_bytes(_fixture_bytes())

    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    # 2 files x (2 responses + 1 conversion); warcinfo filtered by default
    assert len(rows) == 6
    by_uri = {(r["warc_file"].rsplit("/", 1)[-1], r["target_uri"], r["warc_type"]): r for r in rows}
    r1 = by_uri[("a.warc.gz", "http://example.com/a", "response")]
    assert r1["http_status"] == 200
    assert bytes(r1["payload"]).startswith(b"<html>")  # HTTP envelope stripped
    assert by_uri[("b.warc", "http://example.com/b", "response")]["http_status"] == 404
    wet = by_uri[("a.warc.gz", "http://example.com/a", "conversion")]
    assert bytes(wet["payload"]) == b"Hello extracted text" and wet["http_status"] is None

    # record-type filter
    only_wet = read_warc(spark, str(tmp_path), record_types=("conversion",))
    assert only_wet.count() == 2


def test_html_to_text(spark):
    from wrangler_spark.datapipe.text import html_to_text

    rows = [
        (1, "<html><head><title>t</title><style>p{}</style></head>"
            "<body><h1>Head&nbsp;line</h1><p>one &amp; two</p>"
            "<script>var x=1;</script><div>three</div></body></html>"),
        (2, "no markup at all"),
        (3, None),
        (4, "<ul><li>a</li><li>b</li></ul>"),
    ]
    df = spark.createDataFrame(rows, ["id", "html"])
    out = {r["id"]: r["text"] for r in html_to_text(df, "html").collect()}
    assert out[1] == "Head line\none & two\nthree"  # script/style/head content gone
    assert out[2] == "no markup at all"
    assert out[3] is None
    assert out[4] == "a\nb"

    flat = {r["id"]: r["text"] for r in html_to_text(df, "html", keep_block_breaks=False).collect()}
    assert flat[4] == "a b"


def test_warc_to_text_pipeline(spark, tmp_path):
    """End-to-end: WARC -> html_to_text on the BINARY payload -> the
    text stack sees clean lines."""
    from wrangler_spark.datapipe.text import html_to_text

    (tmp_path / "c.warc.gz").write_bytes(gzip.compress(_fixture_bytes()))
    pages = read_warc(spark, str(tmp_path), record_types=("response",))
    texts = html_to_text(pages, "payload", out_col="text").select("target_uri", "text")
    got = {r["target_uri"]: r["text"] for r in texts.collect()}
    assert got["http://example.com/a"] == "Hello & welcome"
    assert got["http://example.com/b"] == "Title\npage two"


def test_html_to_text_directive(spark):
    from wrangler_spark import Pipeline

    df = spark.createDataFrame([(1, "<p>hi</p>")], ["id", "html"])
    out = Pipeline.compile("html-to-text :html body").apply(df).collect()[0]
    assert out["body"] == "hi"


def test_crawl_curation_capstone(spark, tmp_path):
    """The full crawl-to-corpus chain a Common Crawl pipeline runs:
    WARC -> html_to_text -> boilerplate strip -> language/quality gate ->
    exact dedup -> size-targeted corpus write. Every stage is an
    operator under test elsewhere; this asserts they COMPOSE on the
    wire format."""
    import gzip

    from pyspark.sql import functions as F

    from wrangler_spark.datapipe.curation import strip_boilerplate_lines
    from wrangler_spark.datapipe.dedup import exact_dedup
    from wrangler_spark.datapipe.text import html_to_text, langid
    from wrangler_spark.sources import write_corpus

    footer = "<div>Copyright 2026 Example Inc</div>"
    recs = []
    for i in range(12):
        body_txt = (
            f"<h1>Article {i}</h1><p>the quick brown fox and the lazy dog "
            f"talk about entry number {i % 6} in plain english words</p>{footer}"
        )
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body_txt.encode()
        )
        recs.append(
            warc.build_record(
                {
                    "WARC-Record-ID": f"<urn:uuid:{i}>",
                    "WARC-Target-URI": f"http://site{i % 3}.example/{i}",
                    "Content-Type": "application/http; msgtype=response",
                },
                http,
            )
        )
    src = tmp_path / "in"
    src.mkdir()
    (src / "crawl.warc.gz").write_bytes(gzip.compress(b"".join(recs)))

    pages = read_warc(spark, str(src), record_types=("response",))
    texts = html_to_text(pages, "payload", out_col="text").withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    # corpus-frequency boilerplate: the copyright div appears in all 12 docs
    stripped = strip_boilerplate_lines(texts.select("doc_id", "text"), "doc_id", "text", 3)
    assert stripped.agg(F.sum("n_dropped")).collect()[0][0] == 12
    assert stripped.filter(F.col("text").contains("Copyright")).count() == 0

    gated = langid(stripped, "text").filter(F.col("lang_pred") == "en")
    assert gated.count() == 12  # plain-english fixtures all pass

    # bodies repeat mod 6 BUT the kept headline line (Article i) differs;
    # drop it to exercise exact dedup on the curated text
    bodyonly = gated.withColumn("text", F.regexp_replace("text", r"^Article \d+\n", ""))
    survivors = exact_dedup(bodyonly, "doc_id", "text")
    assert survivors.count() == 6

    kept = bodyonly.join(survivors.select("doc_id"), "doc_id").select("doc_id", "text")
    out = tmp_path / "corpus"
    write_corpus(kept, str(out), target_file_mb=64)
    back = spark.read.parquet(str(out))
    assert back.count() == 6


def test_iter_records_resyncs_past_mid_file_corruption():
    """One malformed record (bad Content-Length / junk bytes) must cost
    ONE record, never the rest of the file."""
    good_a = warc.build_record({"WARC-Record-ID": "<a>"}, b"AAAA")
    bad = good_a.replace(b"Content-Length: 4", b"Content-Length: nope")
    junk = b"random garbage not a record\r\n"
    good_b = warc.build_record({"WARC-Record-ID": "<b>"}, b"BBBB")
    good_c = warc.build_record({"WARC-Record-ID": "<c>"}, b"CCCC")

    got = [h["warc-record-id"] for h, _ in warc.iter_records(bad + good_b + good_c)]
    assert got == ["<b>", "<c>"]          # malformed head skipped, rest kept
    got = [h["warc-record-id"] for h, _ in warc.iter_records(good_a + junk + good_c)]
    assert got == ["<a>", "<c>"]          # junk between records skipped
    # a record MISSING Content-Length entirely is skipped alone
    no_len = b"WARC/1.0\r\nWARC-Record-ID: <x>\r\n\r\npayload\r\n\r\n"
    got = [h["warc-record-id"] for h, _ in warc.iter_records(no_len + good_c)]
    assert got == ["<c>"]
    # build_record never lets a stale caller Content-Length break framing
    forged = warc.build_record({"Content-Length": "10", "WARC-Record-ID": "<f>"}, b"X" * 50)
    (h, block), = warc.iter_records(forged + b"")
    assert len(block) == 50 and h["content-length"] == "50"


def test_gzip_corrupt_member_resync_recovers_tail():
    """Per-record-member archive with a CORRUPTED middle member: the
    walk resyncs to the next gzip member header and the tail records
    all survive — one bad member costs one record, never the rest of
    the file. Holds for header corruption (member never starts) and
    mid-deflate corruption (member starts, then dies); a corrupt FINAL
    member just ends the walk."""
    recs = [warc.build_record({"WARC-Record-ID": f"<r{i}>"}, f"BODY{i}".encode() * 20)
            for i in range(5)]
    members = [gzip.compress(r) for r in recs]

    # mid-deflate corruption: flip bytes INSIDE member 2's deflate stream
    m2 = bytearray(members[2])
    m2[len(m2) // 2: len(m2) // 2 + 4] = b"\x00\xff\x00\xff"
    data = b"".join(members[:2]) + bytes(m2) + b"".join(members[3:])
    got = [h["warc-record-id"] for h, _ in warc.iter_records(data)]
    assert got[:2] == ["<r0>", "<r1>"] and got[-2:] == ["<r3>", "<r4>"]
    assert "<r2>" not in got

    # header corruption: member 2's magic destroyed entirely
    m2h = bytearray(members[2])
    m2h[0:3] = b"XXX"
    data = b"".join(members[:2]) + bytes(m2h) + b"".join(members[3:])
    got = [h["warc-record-id"] for h, _ in warc.iter_records(data)]
    assert got[:2] == ["<r0>", "<r1>"] and got[-2:] == ["<r3>", "<r4>"]

    # corrupt FINAL member: earlier records unaffected, walk ends clean
    mlast = bytearray(members[4])
    mlast[len(mlast) // 2] ^= 0xFF
    data = b"".join(members[:4]) + bytes(mlast)
    got = [h["warc-record-id"] for h, _ in warc.iter_records(data)]
    assert got[:4] == ["<r0>", "<r1>", "<r2>", "<r3>"]


def test_gzip_corruption_after_complete_header_never_splices():
    """The frankenrecord regression: a LARGE record whose gzip member is
    corrupted near the END leaves its complete WARC header (and
    Content-Length) in the partial decoded output. The record layer must
    NOT trust that header and consume the next member's bytes as body —
    the corrupted record is dropped and every following record survives
    intact, with its own correct body."""
    import zlib as _z

    bodies = {i: (f"BODY{i}-".encode() * 40000) for i in range(4)}  # ~280 KB each
    recs = [warc.build_record({"WARC-Record-ID": f"<r{i}>"}, bodies[i]) for i in range(4)]
    members = [gzip.compress(r) for r in recs]

    # corrupt member 1 near its END: the deflate stream dies only after
    # most of the record (header + much of the body) decoded cleanly
    m1 = bytearray(members[1])
    cut = int(len(m1) * 0.9)
    m1[cut : cut + 4] = b"\x00\xff\x00\xff"
    data = members[0] + bytes(m1) + members[2] + members[3]

    got = list(warc.iter_records(data))
    ids = [h["warc-record-id"] for h, _ in got]
    assert ids == ["<r0>", "<r2>", "<r3>"], ids   # r1 dropped, r2 NOT destroyed
    for h, block in got:
        i = int(h["warc-record-id"][2])
        assert block == bodies[i], f"record {i} body corrupted"
        assert int(h["content-length"]) == len(block)

    # same shape but the partial output is confirmed to contain r1's
    # complete header: decode the partial member alone the way the
    # production walk does (bounded incremental calls, partials kept)
    d = _z.decompressobj(wbits=31)
    partial, buf = bytearray(), bytes(m1)
    try:
        while buf or d.unconsumed_tail:
            partial += d.decompress(buf or d.unconsumed_tail, 1 << 16)
            buf = b""
            if d.eof or not d.unconsumed_tail:
                break
    except _z.error:
        pass
    assert b"WARC-Record-ID: <r1>" in bytes(partial[:4096])  # header survived
    assert b"\r\n\r\n" in bytes(partial[:4096])              # ... completely

    # clobbered-header member between two large records: the gap costs
    # exactly that record, never a splice of its neighbors
    m2h = bytearray(members[2])
    m2h[0:3] = b"XXX"
    data = members[0] + members[1] + bytes(m2h) + members[3]
    got = list(warc.iter_records(data))
    assert [h["warc-record-id"] for h, _ in got] == ["<r0>", "<r1>", "<r3>"]
    for h, block in got:
        assert block == bodies[int(h["warc-record-id"][2])]
