"""Minimal protobuf wire-format + FileDescriptorSet reader/writer — stdlib only.

Implements the published protobuf encoding (varint / 64-bit / length-
delimited / 32-bit wire types) and just enough of ``descriptor.proto``
(whose field numbers are public protocol) to load a ``protoc
--descriptor_set_out`` FileDescriptorSet and decode DynamicMessage-style.

Covers the surface the reference exercises
(``codec/ProtobufDecoderUsingDescriptor.java``): messages flattened to
``parent_field`` columns, enums as value names, repeated scalars as lists,
nested/repeated messages recursed. Proto3 packed repeated scalars handled.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

# FieldDescriptorProto.Type values (public protocol constants)
T_DOUBLE, T_FLOAT, T_INT64, T_UINT64, T_INT32 = 1, 2, 3, 4, 5
T_FIXED64, T_FIXED32, T_BOOL, T_STRING, T_GROUP = 6, 7, 8, 9, 10
T_MESSAGE, T_BYTES, T_UINT32, T_ENUM, T_SFIXED32 = 11, 12, 13, 14, 15
T_SFIXED64, T_SINT32, T_SINT64 = 16, 17, 18
LABEL_REPEATED = 3

_VARINT_TYPES = {T_INT64, T_UINT64, T_INT32, T_BOOL, T_UINT32, T_ENUM, T_SINT32, T_SINT64}
_FIXED64_TYPES = {T_DOUBLE, T_FIXED64, T_SFIXED64}
_FIXED32_TYPES = {T_FLOAT, T_FIXED32, T_SFIXED32}


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    acc = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def parse_wire(buf: bytes) -> dict[int, list[tuple[int, object]]]:
    """Raw message parse: field number -> [(wire_type, value)] in order.
    Varint/fixed values come back as ints, length-delimited as bytes."""
    out: dict[int, list[tuple[int, object]]] = {}
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        num, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
        elif wt == 1:
            v = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            v = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt} (group encoding?)")
        out.setdefault(num, []).append((wt, v))
    return out


# --- descriptor model -------------------------------------------------------


@dataclass
class PBField:
    name: str
    number: int
    label: int
    type: int
    type_name: str = ""  # fully-qualified, for message/enum fields

    @property
    def repeated(self) -> bool:
        return self.label == LABEL_REPEATED


@dataclass
class PBMessage:
    name: str
    full_name: str
    fields: list[PBField] = field(default_factory=list)


@dataclass
class PBEnum:
    name: str
    full_name: str
    values: dict[int, str] = field(default_factory=dict)


def _parse_enum(buf: bytes, scope: str, index: dict) -> PBEnum:
    w = parse_wire(buf)
    name = w[1][0][1].decode("utf-8")
    full = f"{scope}.{name}" if scope else name
    e = PBEnum(name, full)
    for _, vb in w.get(2, []):
        vw = parse_wire(vb)
        vname = vw[1][0][1].decode("utf-8")
        vnum = vw.get(2, [(0, 0)])[0][1]
        e.values[vnum] = vname
    index[full] = e
    return e


def _parse_message(buf: bytes, scope: str, index: dict) -> PBMessage:
    w = parse_wire(buf)
    name = w[1][0][1].decode("utf-8")
    full = f"{scope}.{name}" if scope else name
    m = PBMessage(name, full)
    for _, fb in w.get(2, []):
        fw = parse_wire(fb)
        m.fields.append(
            PBField(
                name=fw[1][0][1].decode("utf-8"),
                number=fw[3][0][1],
                label=fw.get(4, [(0, 1)])[0][1],
                type=fw.get(5, [(0, T_MESSAGE)])[0][1],
                type_name=fw[6][0][1].decode("utf-8").lstrip(".") if 6 in fw else "",
            )
        )
    for _, nb in w.get(3, []):  # nested_type
        _parse_message(nb, full, index)
    for _, eb in w.get(4, []):  # enum_type
        _parse_enum(eb, full, index)
    index[full] = m
    return m


def parse_descriptor_set(payload: bytes) -> dict[str, object]:
    """FileDescriptorSet bytes -> {fully.qualified.Name: PBMessage|PBEnum}."""
    index: dict[str, object] = {}
    top = parse_wire(payload)
    for _, fb in top.get(1, []):  # repeated FileDescriptorProto file
        fw = parse_wire(fb)
        package = fw[2][0][1].decode("utf-8") if 2 in fw else ""
        for _, mb in fw.get(4, []):  # message_type
            _parse_message(mb, package, index)
        for _, eb in fw.get(5, []):  # file-level enum_type
            _parse_enum(eb, package, index)
    if not index:
        raise ValueError("no message types in descriptor set")
    return index


def find_message(index: dict, name: str) -> PBMessage:
    """Find by full name or bare name (the reference looks up by bare
    message name within the first file)."""
    m = index.get(name)
    if isinstance(m, PBMessage):
        return m
    for k, v in index.items():
        if isinstance(v, PBMessage) and k.rsplit(".", 1)[-1] == name:
            return v
    raise KeyError(f"message '{name}' not found in descriptor; have: {sorted(index)}")


# --- decoding ---------------------------------------------------------------


def _zigzag_dec(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _signed32(u: int) -> int:
    u &= 0xFFFFFFFF
    return u - (1 << 32) if u >= (1 << 31) else u


def _scalar(f: PBField, wt: int, v, index: dict):
    t = f.type
    if t == T_STRING:
        return v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else str(v)
    if t == T_BYTES:
        return bytes(v)
    if t == T_BOOL:
        return bool(v)
    if t == T_DOUBLE:
        return struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
    if t == T_FLOAT:
        return struct.unpack("<f", int(v).to_bytes(4, "little"))[0]
    if t in (T_SINT32, T_SINT64):
        return _zigzag_dec(v)
    if t in (T_INT32, T_INT64):
        return _signed64(v) if v >= (1 << 63) else v
    if t == T_SFIXED64:
        return _signed64(v)
    if t == T_SFIXED32:
        return _signed32(v)
    if t == T_ENUM:
        e = index.get(f.type_name)
        return e.values.get(v, str(v)) if isinstance(e, PBEnum) else v
    if t in (T_UINT64, T_FIXED64):
        # values >= 2^63 must wrap to signed for LongType Arrow conversion —
        # parity with the reference's DynamicMessage, which hands uint64
        # through as a Java (signed) long
        return _signed64(v)
    # uint32/fixed32 always fit a long
    return v


def _unpack_packed(f: PBField, blob: bytes, index: dict) -> list:
    """Proto3 packs repeated numerics into one length-delimited blob."""
    vals = []
    pos, n = 0, len(blob)
    while pos < n:
        if f.type in _VARINT_TYPES:
            v, pos = _read_varint(blob, pos)
        elif f.type in _FIXED64_TYPES:
            v = int.from_bytes(blob[pos : pos + 8], "little")
            pos += 8
        elif f.type in _FIXED32_TYPES:
            v = int.from_bytes(blob[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"field {f.name}: non-numeric packed data")
        vals.append(_scalar(f, 0, v, index))
    return vals


def decode_flat(payload: bytes, msg: PBMessage, index: dict, prefix: str | None = None,
                out: dict | None = None) -> dict:
    """Decode to a flat {column: value} dict, reference-shaped:
    nested/repeated messages flatten as ``parent_field`` and the FIRST
    occurrence's leaves win (parity with ``Row.find`` first-match,
    ``ProtobufDecoderUsingDescriptor.java:decodeMessage``); singular
    scalars take the last wire occurrence (protobuf merge rule); repeated
    scalars come back as Python lists."""
    if out is None:
        out = {}
    wire = parse_wire(payload)
    for f in msg.fields:
        occ = wire.get(f.number)
        if not occ:
            continue
        name = f"{prefix}_{f.name}" if prefix else f.name
        if f.type == T_MESSAGE:
            sub = index.get(f.type_name)
            if not isinstance(sub, PBMessage):
                raise ValueError(f"unresolved message type {f.type_name!r}")
            for wt, blob in occ:
                inner = decode_flat(bytes(blob), sub, index, name)
                for k, v in inner.items():
                    out.setdefault(k, v)
        elif f.repeated:
            vals: list = []
            for wt, v in occ:
                if wt == 2 and f.type not in (T_STRING, T_BYTES):
                    vals.extend(_unpack_packed(f, v, index))
                else:
                    vals.append(_scalar(f, wt, v, index))
            out[name] = vals
        else:
            wt, v = occ[-1]
            out[name] = _scalar(f, wt, v, index)
    return out


def flat_schema(msg: PBMessage, index: dict, prefix: str | None = None,
                seen: tuple = ()) -> list[tuple[str, PBField]]:
    """Static flattened column list (name, leaf field) mirroring
    decode_flat's naming; recursive message cycles cut off."""
    cols: list[tuple[str, PBField]] = []
    for f in msg.fields:
        name = f"{prefix}_{f.name}" if prefix else f.name
        if f.type == T_MESSAGE:
            if f.type_name in seen:
                continue
            sub = index.get(f.type_name)
            if isinstance(sub, PBMessage):
                cols.extend(flat_schema(sub, index, name, seen + (f.type_name,)))
        else:
            cols.append((name, f))
    return cols


# --- encoding (the exact inverse — payload synthesis + tests) ---------------


def write_varint(n: int) -> bytes:
    """Unsigned varint bytes (inverse of ``_read_varint``); negative
    ints wrap to their 64-bit two's-complement encoding, per spec."""
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_enc(n: int) -> int:
    return ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)


def _tag(number: int, wt: int) -> bytes:
    return write_varint((number << 3) | wt)


def _encode_scalar(f: PBField, value, index: dict) -> bytes:
    """One tagged scalar field occurrence (unpacked encoding — the
    decoder accepts both packed and unpacked)."""
    t = f.type
    if t == T_STRING:
        b = str(value).encode("utf-8")
        return _tag(f.number, 2) + write_varint(len(b)) + b
    if t == T_BYTES:
        b = bytes(value)
        return _tag(f.number, 2) + write_varint(len(b)) + b
    if t == T_BOOL:
        return _tag(f.number, 0) + write_varint(1 if value else 0)
    if t == T_DOUBLE:
        return _tag(f.number, 1) + struct.pack("<d", float(value))
    if t == T_FLOAT:
        return _tag(f.number, 5) + struct.pack("<f", float(value))
    if t in (T_SINT32, T_SINT64):
        return _tag(f.number, 0) + write_varint(_zigzag_enc(int(value)))
    if t in (T_INT32, T_INT64, T_UINT32, T_UINT64):
        return _tag(f.number, 0) + write_varint(int(value))
    if t in (T_FIXED64, T_SFIXED64):
        return _tag(f.number, 1) + (int(value) & ((1 << 64) - 1)).to_bytes(8, "little")
    if t in (T_FIXED32, T_SFIXED32):
        return _tag(f.number, 5) + (int(value) & 0xFFFFFFFF).to_bytes(4, "little")
    if t == T_ENUM:
        e = index.get(f.type_name)
        if isinstance(e, PBEnum) and isinstance(value, str):
            for num, name in e.values.items():
                if name == value:
                    return _tag(f.number, 0) + write_varint(num)
            raise ValueError(f"enum {f.type_name}: unknown symbol {value!r}")
        return _tag(f.number, 0) + write_varint(int(value))
    raise ValueError(f"field {f.name}: unsupported encode type {t}")


def encode_message(values: dict, msg: PBMessage, index: dict) -> bytes:
    """Encode {field_name: value} against a descriptor message — the
    inverse of ``decode_flat`` at one nesting level: nested messages
    take a dict value, repeated fields a list, missing/None fields are
    simply absent (proto3 presence semantics)."""
    out = bytearray()
    for f in msg.fields:
        if f.name not in values or values[f.name] is None:
            continue
        v = values[f.name]
        if f.type == T_MESSAGE:
            sub = index.get(f.type_name)
            if not isinstance(sub, PBMessage):
                raise ValueError(f"unresolved message type {f.type_name!r}")
            items = v if f.repeated and isinstance(v, list) else [v]
            for item in items:
                b = encode_message(item, sub, index)
                out += _tag(f.number, 2) + write_varint(len(b)) + b
        elif f.repeated and isinstance(v, list):
            for item in v:
                out += _encode_scalar(f, item, index)
        else:
            out += _encode_scalar(f, v, index)
    return bytes(out)


def _ld(num: int, payload) -> bytes:
    b = payload.encode("utf-8") if isinstance(payload, str) else bytes(payload)
    return _tag(num, 2) + write_varint(len(b)) + b


def build_descriptor_set(
    package: str,
    messages: dict[str, list[tuple]],
    enums: dict[str, dict[int, str]] | None = None,
) -> bytes:
    """Synthesize ``protoc --descriptor_set_out`` FileDescriptorSet
    bytes from a message spec — {MessageName: [(field_name, number,
    type, label, type_name), ...]} with label/type_name optional per
    tuple (defaults: optional scalar). Uses only the public
    descriptor.proto field numbers this module's reader understands;
    round-trips through ``parse_descriptor_set``."""
    msgs = bytearray()
    for mname, fields in messages.items():
        body = bytearray(_ld(1, mname))
        for spec in fields:
            fname, number, ftype = spec[0], spec[1], spec[2]
            label = spec[3] if len(spec) > 3 else 1
            type_name = spec[4] if len(spec) > 4 else ""
            fb = bytearray(_ld(1, fname))
            fb += _tag(3, 0) + write_varint(number)
            fb += _tag(4, 0) + write_varint(label)
            fb += _tag(5, 0) + write_varint(ftype)
            if type_name:
                fb += _ld(6, "." + type_name)
            body += _ld(2, bytes(fb))
        msgs += _ld(4, bytes(body))
    ens = bytearray()
    for ename, vals in (enums or {}).items():
        eb = bytearray(_ld(1, ename))
        for num, vname in vals.items():
            vb = _ld(1, vname) + _tag(2, 0) + write_varint(num)
            eb += _ld(2, vb)
        ens += _ld(5, bytes(eb))
    file_proto = _ld(1, f"{package or 'synth'}.proto")
    if package:
        file_proto += _ld(2, package)
    file_proto += bytes(msgs) + bytes(ens)
    return _ld(1, bytes(file_proto))
