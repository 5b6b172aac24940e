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


def iter_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, block) per WARC record. Header names are
    lower-cased; values are stripped. Tolerates trailing garbage (stops
    at the first non-record byte run) — a truncated tail record is
    dropped rather than raised, matching how crawl pipelines treat
    partial downloads."""
    data = maybe_gunzip(data)
    i, n = 0, len(data)
    while i < n:
        while i < n and data[i : i + 1] in (b"\r", b"\n"):
            i += 1
        if i >= n or not data.startswith(b"WARC/", i):
            return
        end_hdr = data.find(b"\r\n\r\n", i)
        if end_hdr < 0:
            return
        headers: dict[str, str] = {}
        for ln in data[i:end_hdr].decode("utf-8", "replace").split("\r\n")[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            return
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
    of iter_records)."""
    hdr = {"WARC-Type": warc_type, "Content-Length": str(len(block)), **headers}
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in hdr.items()
    )
    return head + b"\r\n" + block + b"\r\n\r\n"
