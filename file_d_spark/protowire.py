"""Pure-Python proto3 fallback for the protobuf decoder.

The reference compiles ``.proto`` sources at runtime and decodes events
with a dynamic message (/root/reference/decoder/protobuf.go:35-82,
protojson output merged into the event root).  Spark's native
``from_protobuf`` needs the spark-protobuf jar and a compiled
descriptor set; when either is absent this module provides the same
config surface (``proto_file`` as path or inline content +
``proto_message``) with a minimal proto3 parser and wire-format
decoder, Arrow-batched via a pandas UDF that emits protojson-shaped
JSON for ``from_json``.

Supported: nested/repeated messages, all scalar types (varint, zigzag,
fixed, float/double, bool, string, bytes), packed repeated scalars,
enums (as numbers), json_name options.  Not supported: imports,
maps, oneof grouping (members decode as plain fields), extensions.
protojson conventions kept: 64-bit ints render as strings, bytes as
base64, field keys use json_name else lowerCamelCase.
"""

from __future__ import annotations

import base64
import re
import struct as _struct
from dataclasses import dataclass, field

_SCALARS = {
    "double", "float", "int32", "int64", "uint32", "uint64", "sint32",
    "sint64", "fixed32", "fixed64", "sfixed32", "sfixed64", "bool",
    "string", "bytes",
}
_VARINT = {"int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool"}
_I64 = {"fixed64", "sfixed64", "double"}
_I32 = {"fixed32", "sfixed32", "float"}
_LONG64 = {"int64", "uint64", "sint64", "fixed64", "sfixed64"}


@dataclass
class FieldDef:
    name: str
    json_name: str
    number: int
    type: str  # scalar name, "enum", or message type name
    repeated: bool = False


@dataclass
class MessageDef:
    name: str
    fields: dict[int, FieldDef] = field(default_factory=dict)


def _lower_camel(name: str) -> str:
    parts = name.split("_")
    return parts[0] + "".join(p.title() for p in parts[1:]) if "_" in name else name


def _strip_comments(text: str) -> str:
    text = re.sub(r"//[^\n]*", "", text)
    return re.sub(r"/\*.*?\*/", "", text, flags=re.S)


def parse_proto(text: str) -> dict[str, MessageDef]:
    """Parse proto3 source into {qualified_message_name: MessageDef}.
    Nested messages register under both 'Outer.Inner' and 'Inner'."""
    text = _strip_comments(text)
    messages: dict[str, MessageDef] = {}
    enums: set[str] = set()

    tok = re.findall(r"[{};=]|\[[^\]]*\]|[^\s{};=]+", text)
    i = 0

    def parse_block(prefix: str, msg: MessageDef | None):
        nonlocal i
        while i < len(tok):
            t = tok[i]
            if t == "}":
                i += 1
                return
            if t == "message":
                name = tok[i + 1]
                qname = f"{prefix}.{name}" if prefix else name
                child = MessageDef(qname)
                messages[qname] = child
                messages.setdefault(name, child)
                i += 3  # message Name {
                parse_block(qname, child)
                continue
            if t == "enum":
                name = tok[i + 1]
                enums.add(name)
                enums.add(f"{prefix}.{name}" if prefix else name)
                i += 3
                depth = 1
                while i < len(tok) and depth:
                    if tok[i] == "{":
                        depth += 1
                    elif tok[i] == "}":
                        depth -= 1
                    i += 1
                continue
            if t in ("syntax", "package", "option", "import"):
                while i < len(tok) and tok[i] != ";":
                    i += 1
                i += 1
                continue
            if t in ("reserved", "extensions"):
                while i < len(tok) and tok[i] != ";":
                    i += 1
                i += 1
                continue
            if t == "oneof":
                i += 3  # oneof name { — members parse as plain fields
                parse_block(prefix, msg)
                continue
            if msg is not None and t in ("repeated", "optional", "required") or (
                msg is not None
                and (t in _SCALARS or re.fullmatch(r"[A-Za-z_][\w.]*", t))
            ):
                repeated = False
                if t in ("repeated", "optional", "required"):
                    repeated = t == "repeated"
                    i += 1
                    t = tok[i]
                ftype = t
                fname = tok[i + 1]
                # name = N [opts] ;
                assert tok[i + 2] == "=", f"bad field at {fname}"
                number = int(tok[i + 3])
                i += 4
                json_name = None
                while i < len(tok) and tok[i] != ";":
                    m = re.search(r'json_name\s*=\s*"([^"]+)"', tok[i])
                    if m:
                        json_name = m.group(1)
                    i += 1
                i += 1  # ;
                if msg is not None:
                    msg.fields[number] = FieldDef(
                        name=fname,
                        json_name=json_name or _lower_camel(fname),
                        number=number,
                        type=ftype,
                        repeated=repeated,
                    )
                continue
            i += 1

    parse_block("", None)
    # resolve enum-typed fields to varint ints
    for m in messages.values():
        for f in m.fields.values():
            if f.type in enums:
                f.type = "enum"
    return messages


# --- wire format -----------------------------------------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = data[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _to_signed(n: int, bits: int) -> int:
    if n >= 1 << (bits - 1):
        n -= 1 << bits
    return n


def _scalar_from_varint(ftype: str, v: int):
    if ftype == "bool":
        return bool(v)
    if ftype in ("sint32", "sint64"):
        return _zigzag(v)
    if ftype == "int32":
        return _to_signed(v & 0xFFFFFFFFFFFFFFFF, 64)
    if ftype == "int64":
        return _to_signed(v, 64)
    return v  # uint32/uint64/enum


def decode_message(
    data: bytes, msg: MessageDef, registry: dict[str, MessageDef]
) -> dict:
    """Decode one message into a protojson-shaped dict."""
    out: dict = {}
    pos, end = 0, len(data)
    while pos < end:
        tag, pos = _read_varint(data, pos)
        fnum, wire = tag >> 3, tag & 7
        fd = msg.fields.get(fnum)
        if wire == 0:
            v, pos = _read_varint(data, pos)
            if fd is None:
                continue
            val = _scalar_from_varint(fd.type, v)
        elif wire == 1:
            raw = data[pos : pos + 8]
            pos += 8
            if fd is None:
                continue
            if fd.type == "double":
                val = _struct.unpack("<d", raw)[0]
            elif fd.type == "sfixed64":
                val = _struct.unpack("<q", raw)[0]
            else:
                val = _struct.unpack("<Q", raw)[0]
        elif wire == 5:
            raw = data[pos : pos + 4]
            pos += 4
            if fd is None:
                continue
            if fd.type == "float":
                val = _struct.unpack("<f", raw)[0]
            elif fd.type == "sfixed32":
                val = _struct.unpack("<i", raw)[0]
            else:
                val = _struct.unpack("<I", raw)[0]
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            raw = data[pos : pos + ln]
            pos += ln
            if fd is None:
                continue
            if fd.type == "string":
                val = raw.decode("utf-8", "replace")
            elif fd.type == "bytes":
                val = base64.b64encode(raw).decode("ascii")
            elif fd.type in _SCALARS or fd.type == "enum":
                # packed repeated scalars
                vals, p2 = [], 0
                while p2 < len(raw):
                    if fd.type in _I64:
                        piece, p2 = raw[p2 : p2 + 8], p2 + 8
                        if fd.type == "double":
                            vals.append(_struct.unpack("<d", piece)[0])
                        elif fd.type == "sfixed64":
                            vals.append(_struct.unpack("<q", piece)[0])
                        else:
                            vals.append(_struct.unpack("<Q", piece)[0])
                    elif fd.type in _I32:
                        piece, p2 = raw[p2 : p2 + 4], p2 + 4
                        if fd.type == "float":
                            vals.append(_struct.unpack("<f", piece)[0])
                        elif fd.type == "sfixed32":
                            vals.append(_struct.unpack("<i", piece)[0])
                        else:
                            vals.append(_struct.unpack("<I", piece)[0])
                    else:
                        v, p2 = _read_varint(raw, p2)
                        vals.append(_scalar_from_varint(fd.type, v))
                out.setdefault(fd.json_name, []).extend(
                    _json_scalar(fd.type, v) for v in vals
                )
                continue
            else:
                sub = registry.get(fd.type) or registry.get(
                    fd.type.rsplit(".", 1)[-1]
                )
                if sub is None:
                    continue
                val = decode_message(raw, sub, registry)
        else:  # deprecated group wires
            break
        if fd.type in _SCALARS or fd.type == "enum":
            val = _json_scalar(fd.type, val)
        if fd.repeated:
            out.setdefault(fd.json_name, []).append(val)
        else:
            out[fd.json_name] = val
    return out


def _json_scalar(ftype: str, v):
    # protojson: 64-bit integers render as strings
    if ftype in _LONG64 and not isinstance(v, str):
        return str(v)
    return v


# --- Spark integration -----------------------------------------------------

_SPARK_TYPES = {
    "double": "double", "float": "double",
    "int32": "long", "sint32": "long", "sfixed32": "long", "uint32": "long",
    "fixed32": "long", "enum": "long",
    "int64": "string", "uint64": "string", "sint64": "string",
    "fixed64": "string", "sfixed64": "string",
    "bool": "boolean", "string": "string", "bytes": "string",
}


def spark_schema(msg: MessageDef, registry: dict[str, MessageDef]) -> str:
    """DDL schema string mirroring the protojson shape."""
    cols = []
    for fd in sorted(msg.fields.values(), key=lambda f: f.number):
        if fd.type in _SPARK_TYPES:
            t = _SPARK_TYPES[fd.type]
        else:
            sub = registry.get(fd.type) or registry.get(fd.type.rsplit(".", 1)[-1])
            t = (
                f"struct<{spark_schema(sub, registry)}>"
                if sub is not None
                else "string"
            )
        if fd.repeated:
            t = f"array<{t}>"
        cols.append(f"`{fd.json_name}`:{t}")
    return ",".join(cols)
