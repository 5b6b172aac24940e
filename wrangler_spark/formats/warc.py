"""WARC (Web ARChive, ISO 28500) record parsing — pure stdlib.

The format underlying Common Crawl and web-archive corpora: a WARC file
is a sequence of records, each ``WARC/1.x\\r\\n`` + header lines + blank
line + exactly ``Content-Length`` payload bytes + ``\\r\\n\\r\\n``. Files
ship either plain or gzipped; the archival convention is ONE GZIP MEMBER
PER RECORD (so tools can seek), which stdlib ``gzip.decompress`` handles
transparently (it concatenates members).

This module only parses bytes; the Spark plumbing (file parallelism,
batching, schema) lives in ``wrangler_spark.sources.read_warc``.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

GZIP_MAGIC = b"\x1f\x8b"


def maybe_gunzip(data: bytes) -> bytes:
    """Decompress iff the buffer is gzip (multi-member safe)."""
    if data[:2] == GZIP_MAGIC:
        return gzip.decompress(data)
    return data


def _resync(data: bytes, pos: int) -> int:
    """Position of the next plausible record start (a ``WARC/`` version
    line at line start) past ``pos``, or len(data). Bounds the damage
    of one malformed record to that record — without this, mid-file
    corruption silently discards everything after it. A ``WARC/`` at
    line start inside a payload can false-positive; the bogus candidate
    then fails header parsing and resyncs again, so the loss stays
    local either way."""
    j = data.find(b"\nWARC/", pos)
    return len(data) if j < 0 else j + 1


def iter_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, block) per WARC record. Header names are
    lower-cased; values are stripped. A truncated TAIL record is dropped
    rather than raised (partial downloads); a malformed MID-FILE record
    (missing/non-numeric Content-Length — a mandatory header — or
    non-record bytes) is skipped by resyncing to the next record
    boundary, so one bad record never discards the rest of the file."""
    data = maybe_gunzip(data)
    i, n = 0, len(data)
    while i < n:
        while i < n and data[i : i + 1] in (b"\r", b"\n"):
            i += 1
        if i >= n:
            return
        if not data.startswith(b"WARC/", i):
            i = _resync(data, i)
            continue
        end_hdr = data.find(b"\r\n\r\n", i)
        if end_hdr < 0:
            return  # truncated header at the tail
        headers: dict[str, str] = {}
        for ln in data[i:end_hdr].decode("utf-8", "replace").split("\r\n")[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        clen_s = headers.get("content-length")
        if clen_s is None or not clen_s.isdigit():
            i = _resync(data, end_hdr)  # malformed record: skip it alone
            continue
        clen = int(clen_s)
        start = end_hdr + 4
        if start + clen > n:
            return  # truncated tail record
        yield headers, data[start : start + clen]
        i = start + clen


def split_http_payload(block: bytes) -> tuple[int | None, bytes]:
    """(status, body) for an ``application/http`` response block: parse
    the status line, drop the HTTP headers. Non-HTTP-looking blocks come
    back unchanged with status None."""
    if not block.startswith(b"HTTP/"):
        return None, block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, block
    status_line = block[: block.find(b"\r\n")].decode("ascii", "replace")
    parts = status_line.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    return status, block[sep + 4 :]


def build_record(
    headers: dict[str, str], block: bytes, warc_type: str = "response"
) -> bytes:
    """Serialize one WARC record (test/fixture helper — the writer side
    of iter_records). The Content-Length is always COMPUTED from the
    block — a caller-supplied value (e.g. copied from an HTTP response)
    would desynchronize the record framing for everything after it."""
    hdr = {"WARC-Type": warc_type, **headers}
    hdr["Content-Length"] = str(len(block))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in hdr.items()
    )
    return head + b"\r\n" + block + b"\r\n\r\n"
