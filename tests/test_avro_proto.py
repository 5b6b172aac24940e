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


# --- protobuf ----------------------------------------------------------------
# wire-format encoding helpers (published protobuf encoding)


def vint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def tag(num: int, wt: int) -> bytes:
    return vint((num << 3) | wt)


def ld(num: int, payload: bytes | str) -> bytes:
    b = payload.encode("utf-8") if isinstance(payload, str) else payload
    return tag(num, 2) + vint(len(b)) + b


def vi(num: int, val: int) -> bytes:
    return tag(num, 0) + vint(val)


def fdp_field(name: str, number: int, ftype: int, label: int = 1, type_name: str = "") -> bytes:
    # FieldDescriptorProto: 1 name, 3 number, 4 label, 5 type, 6 type_name
    out = ld(1, name) + vi(3, number) + vi(4, label) + vi(5, ftype)
    if type_name:
        out += ld(6, type_name)
    return out


def addressbook_descriptor_set() -> bytes:
    """FileDescriptorSet for the canonical protobuf-tutorial addressbook
    (Person / PhoneNumber / PhoneType / AddressBook), built by hand."""
    phone_number = ld(1, "PhoneNumber") + ld(2, fdp_field("number", 1, 9)) + ld(
        2, fdp_field("type", 2, 14, 1, ".tutorial.Person.PhoneType")
    )
    phone_type = ld(1, "PhoneType") + ld(2, ld(1, "MOBILE") + vi(2, 0)) + ld(
        2, ld(1, "HOME") + vi(2, 1)
    ) + ld(2, ld(1, "WORK") + vi(2, 2))
    person = (
        ld(1, "Person")
        + ld(2, fdp_field("name", 1, 9))
        + ld(2, fdp_field("id", 2, 5))
        + ld(2, fdp_field("email", 3, 9))
        + ld(2, fdp_field("phones", 4, 11, 3, ".tutorial.Person.PhoneNumber"))
        + ld(3, phone_number)  # nested_type
        + ld(4, phone_type)    # enum_type
    )
    book = ld(1, "AddressBook") + ld(
        2, fdp_field("people", 1, 11, 3, ".tutorial.Person")
    )
    fdp = ld(1, "addressbook.proto") + ld(2, "tutorial") + ld(4, person) + ld(4, book)
    return ld(1, fdp)  # FileDescriptorSet.file


def test_parse_as_protobuf_addressbook(spark):
    """Mirrors ProtobufDecoderUsingDescriptorTest: AddressBook with one
    Person, expecting people_* flattened columns and the enum NAME."""
    register_schema("abook", addressbook_descriptor_set())
    phone = ld(1, "555-4321") + vi(2, 1)  # HOME
    john = (
        ld(1, "Joltie Root") + vi(2, 1234)
        + ld(3, "joltie.root@example.com") + ld(4, phone)
    )
    payload = ld(1, john)
    df = spark.createDataFrame([(payload,)], "payload binary")
    out = Pipeline.compile("parse-as-protobuf :payload abook AddressBook").apply(df)
    r = out.collect()[0]
    assert r["people_name"] == "Joltie Root"
    assert r["people_id"] == 1234
    assert r["people_email"] == "joltie.root@example.com"
    assert r["people_phones_number"] == "555-4321"
    assert r["people_phones_type"] == "HOME"


def test_parse_as_protobuf_repeated_and_packed(spark):
    register_schema("abook2", addressbook_descriptor_set())
    # two people: first-match wins for flattened leaves (Row.find parity)
    p1 = ld(1, "First") + vi(2, 1)
    p2 = ld(1, "Second") + vi(2, 2)
    df = spark.createDataFrame([(ld(1, p1) + ld(1, p2),)], "payload binary")
    out = Pipeline.compile("parse-as-protobuf :payload abook2 AddressBook").apply(df)
    r = out.collect()[0]
    assert r["people_name"] == "First" and r["people_id"] == 1

    # Person decoded directly, negative int32 varint (10-byte two's complement)
    neg = (-7) & ((1 << 64) - 1)
    person_payload = ld(1, "Neg") + vi(2, neg)
    df2 = spark.createDataFrame([(person_payload,)], "payload binary")
    out2 = Pipeline.compile("parse-as-protobuf :payload abook2 Person").apply(df2)
    assert out2.collect()[0]["id"] == -7


def test_parse_as_protobuf_uint64_wraps_to_signed_long(spark):
    """uint64/fixed64 >= 2^63 must wrap to a signed Java-long (DynamicMessage
    parity) or the LongType Arrow conversion raises at executor runtime."""
    msg = ld(1, "U") + ld(2, fdp_field("u", 1, 4)) + ld(2, fdp_field("f", 2, 6))
    fdp = ld(1, "u.proto") + ld(2, "t") + ld(4, msg)
    register_schema("u64", ld(1, fdp))
    umax = (1 << 64) - 1  # wire: all-ones varint → Java long -1
    payload = vi(1, umax) + tag(2, 1) + umax.to_bytes(8, "little")
    df = spark.createDataFrame([(payload,)], "payload binary")
    out = Pipeline.compile("parse-as-protobuf :payload u64 U").apply(df)
    r = out.collect()[0]
    assert r["u"] == -1 and r["f"] == -1


REF_DESC = "/root/reference/wrangler-core/src/test/resources/addressbook.desc"


@pytest.mark.skipif(not __import__("os").path.exists(REF_DESC), reason="reference golden absent")
def test_parse_as_protobuf_real_protoc_descriptor(spark):
    """The reference test suite's protoc-generated descriptor must parse to
    the same message index and column shape as the hand-built one."""
    with open(REF_DESC, "rb") as fh:
        register_schema("abook_real", fh.read())
    phone = ld(1, "555-4321") + vi(2, 1)
    john = ld(1, "Joltie Root") + vi(2, 1234) + ld(3, "joltie.root@example.com") + ld(4, phone)
    df = spark.createDataFrame([(ld(1, john),)], "payload binary")
    out = Pipeline.compile("parse-as-protobuf :payload abook_real AddressBook").apply(df)
    r = out.collect()[0]
    assert r["people_name"] == "Joltie Root"
    assert r["people_id"] == 1234
    assert r["people_phones_type"] == "HOME"
