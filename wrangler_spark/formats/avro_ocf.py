"""Minimal Apache Avro Object Container File reader — stdlib only.

Implements the published Avro 1.x spec (binary encoding + OCF framing):
zigzag-varint ints/longs, IEEE float/double, length-prefixed bytes/string,
records, enums, fixed, arrays, maps, unions; null and deflate codecs.
Enough for the reference's ``parse-as-avro-file`` surface
(``parser/ParseAvroFile.java:79-151`` reads generic records with
DataFileReader).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"


def _register_named(schema: Any, names: dict, ns: str | None = None) -> None:
    """Walk a schema, indexing record/enum/fixed definitions so later
    references by (full)name resolve (Avro spec: named types)."""
    if isinstance(schema, list):
        for b in schema:
            _register_named(b, names, ns)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    ns = schema.get("namespace", ns)
    if t in ("record", "enum", "fixed"):
        name = schema["name"]
        full = name if "." in name else (f"{ns}.{name}" if ns else name)
        names[full] = schema
        names[name] = schema
        if t == "record":
            for f in schema["fields"]:
                _register_named(f["type"], names, ns)
    elif t == "array":
        _register_named(schema.get("items"), names, ns)
    elif t == "map":
        _register_named(schema.get("values"), names, ns)


class _Reader:
    def __init__(self, buf: bytes, names: dict | None = None):
        self.b = buf
        self.pos = 0
        self.names = names or {}

    def read(self, n: int) -> bytes:
        out = self.b[self.pos : self.pos + n]
        if len(out) < n:
            raise EOFError("truncated avro data")
        self.pos += n
        return out

    def at_end(self) -> bool:
        return self.pos >= len(self.b)

    def zigzag(self) -> int:
        shift = 0
        acc = 0
        while True:
            byte = self.b[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def decode(self, schema: Any) -> Any:
        if isinstance(schema, str):
            t = schema
        elif isinstance(schema, dict):
            t = schema["type"]
        elif isinstance(schema, list):  # union
            idx = self.zigzag()
            return self.decode(schema[idx])
        else:
            raise ValueError(f"bad schema node {schema!r}")

        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) == b"\x01"
        if t in ("int", "long"):
            return self.zigzag()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "bytes":
            return self.read(self.zigzag())
        if t == "string":
            return self.read(self.zigzag()).decode("utf-8")
        if t == "record":
            return {f["name"]: self.decode(f["type"]) for f in schema["fields"]}
        if t == "enum":
            return schema["symbols"][self.zigzag()]
        if t == "fixed":
            return self.read(schema["size"])
        if t == "array":
            out = []
            while True:
                n = self.zigzag()
                if n == 0:
                    break
                if n < 0:
                    self.zigzag()  # block byte size, unused
                    n = -n
                for _ in range(n):
                    out.append(self.decode(schema["items"]))
            return out
        if t == "map":
            out = {}
            while True:
                n = self.zigzag()
                if n == 0:
                    break
                if n < 0:
                    self.zigzag()
                    n = -n
                for _ in range(n):
                    k = self.read(self.zigzag()).decode("utf-8")
                    out[k] = self.decode(schema["values"])
            return out
        if t in self.names:  # reference to a previously defined named type
            return self.decode(self.names[t])
        raise ValueError(f"unsupported avro type {t!r}")


def parse_schema(schema_text) -> tuple[Any, dict]:
    """Parse an .avsc JSON writer schema → (schema, named-type index)."""
    schema = json.loads(schema_text) if isinstance(schema_text, (str, bytes)) else schema_text
    names: dict = {}
    _register_named(schema, names)
    return schema, names


def decode_binary_stream(payload: bytes, schema: Any, names: dict) -> list[Any]:
    """Decode a raw (schema-less) concatenation of binary-encoded datums —
    the ``parse-as-avro ... binary`` message shape: the reference's
    BinaryAvroDecoder reads records until EOF
    (``codec/BinaryAvroDecoder.java:59-86``)."""
    r = _Reader(payload, names)
    records: list[Any] = []
    while not r.at_end():
        records.append(r.decode(schema))
    return records


def _branch_name(branch: Any) -> str:
    if isinstance(branch, str):
        return branch
    if isinstance(branch, dict):
        t = branch["type"]
        if t in ("record", "enum", "fixed"):
            name = branch["name"]
            ns = branch.get("namespace")
            return f"{ns}.{name}" if ns and "." not in name else name
        return t
    raise ValueError(f"bad union branch {branch!r}")


def _from_json(value: Any, schema: Any, names: dict) -> Any:
    """Map a JSON-encoded Avro value (the spec's JSON encoding: unions as
    single-key {"branch": value} objects) to a Python value."""
    if isinstance(schema, str) and schema in names:
        schema = names[schema]
    if isinstance(schema, list):  # union
        if value is None:
            return None
        if not isinstance(value, dict) or len(value) != 1:
            raise ValueError(f"union value must be a 1-key object, got {value!r}")
        key, inner = next(iter(value.items()))
        for b in schema:
            bn = _branch_name(b)
            if bn == key or bn.rsplit(".", 1)[-1] == key.rsplit(".", 1)[-1]:
                return _from_json(inner, b, names)
        raise ValueError(f"union branch {key!r} not in schema")
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "record":
        return {
            f["name"]: _from_json(value.get(f["name"]), f["type"], names)
            for f in schema["fields"]
        }
    if t == "array":
        return [_from_json(v, schema["items"], names) for v in value]
    if t == "map":
        return {k: _from_json(v, schema["values"], names) for k, v in value.items()}
    if t == "bytes" or t == "fixed":
        # JSON encoding: latin-1 string of the raw bytes
        return value.encode("latin-1") if isinstance(value, str) else value
    if t in ("int", "long"):
        return int(value) if value is not None else None
    if t in ("float", "double"):
        return float(value) if value is not None else None
    return value


def decode_json_stream(payload: bytes, schema: Any, names: dict) -> list[Any]:
    """Decode concatenated JSON-encoded Avro records until EOF — the
    ``parse-as-avro ... json`` message shape (``codec/JsonAvroDecoder.java``)."""
    text = payload.decode("utf-8") if isinstance(payload, (bytes, bytearray)) else str(payload)
    dec = json.JSONDecoder()
    records: list[Any] = []
    pos = 0
    n = len(text)
    while pos < n:
        while pos < n and text[pos] in " \t\r\n":
            pos += 1
        if pos >= n:
            break
        obj, pos = dec.raw_decode(text, pos)
        records.append(_from_json(obj, schema, names))
    return records


def read_ocf(payload: bytes) -> tuple[dict, list[Any]]:
    """Parse an OCF payload → (schema, records)."""
    r = _Reader(payload)
    if r.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = r.zigzag()
        if n == 0:
            break
        if n < 0:
            r.zigzag()
            n = -n
        for _ in range(n):
            k = r.read(r.zigzag()).decode("utf-8")
            meta[k] = r.read(r.zigzag())
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    names: dict = {}
    _register_named(schema, names)

    records: list[Any] = []
    while not r.at_end():
        count = r.zigzag()
        size = r.zigzag()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        br = _Reader(block, names)
        for _ in range(count):
            records.append(br.decode(schema))
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, records
