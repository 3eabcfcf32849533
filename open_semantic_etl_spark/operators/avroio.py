"""Avro object-container decode — native reader + fixture encoder.

Reference bar: the Tika tier the reference leans on for "any format"
(enhance_extract_text_tika_server.py:33-262) feeds tabular sidecar
files through parsers the same way enhance_csv.py:205-253 turns CSV
rows into child documents; Avro is the row-oriented sibling of the
parquet/ORC columnar files handled in sources/columnar.py.  pyarrow
carries no Avro reader, so the object-container file format (Apache
Avro spec §"Object Container Files" + §"Binary Encoding" — public) is
implemented here from scratch.

Layout:

  file   := magic("Obj\\x01") meta:map<string,bytes> sync[16] block*
  block  := count:long  size:long  data[size]  sync[16]
  map    := ( count:long [size:long if count<0] entry[abs(count)] )* 0
  long   := zigzag(n) as base-128 varint, 7 bits/byte, LSB group first

``avro.schema`` (JSON) drives the datum decode: primitives, records,
enums, fixeds, arrays, maps and unions are all supported; named-type
references resolve through a names table.  Codecs: ``null``,
``deflate`` (raw RFC-1951), ``snappy`` (raw snappy + 4-byte
big-endian CRC-32 suffix of the UNCOMPRESSED block, verified).

Fail-safe rules match the other container tiers: any malformation
(bad magic, sync mismatch, CRC mismatch, varint overrun, counts that
exceed the remaining bytes, unknown codec) raises ValueError and the
caller degrades to zero children — never half a table.  Row/byte
caps bound a crafted count varint before any allocation.
"""

from __future__ import annotations

import json
import struct
import zlib

__all__ = ["read_avro", "build_avro"]

_MAGIC = b"Obj\x01"
_MAX_STR = 1 << 26  # single value cap (bytes/string/fixed)
_MAX_ITEMS = 1 << 20  # single array/map/block item-count cap

_PRIMITIVES = frozenset(
    ("null", "boolean", "int", "long", "float", "double", "bytes", "string")
)


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if n < 0 or self.pos + n > len(self.data):
            raise ValueError("avro: read past end")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        n, shift = 0, 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("avro: truncated varint")
            b = self.data[self.pos]
            self.pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise ValueError("avro: varint over 64 bits")
        return (n >> 1) ^ -(n & 1)  # zigzag

    def at_end(self) -> bool:
        return self.pos >= len(self.data)


def _resolve(schema, names: dict):
    """string schema → primitive name or registered named type."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise ValueError("avro: unknown type %r" % schema)
    return schema


def _register(schema: dict, names: dict) -> None:
    name = schema.get("name")
    if not name:
        raise ValueError("avro: named type without a name")
    ns = schema.get("namespace")
    full = name if "." in name or not ns else f"{ns}.{name}"
    names[full] = schema
    names[name] = schema  # short-name refs are common in practice


def _decode(r: _Reader, schema, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise ValueError("avro: union index out of range")
        return _decode(r, schema[idx], names)
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return r.take(1) != b"\x00"
        if schema in ("int", "long"):
            return r.long()
        if schema == "float":
            return struct.unpack("<f", r.take(4))[0]
        if schema == "double":
            return struct.unpack("<d", r.take(8))[0]
        if schema in ("bytes", "string"):
            n = r.long()
            if not 0 <= n <= _MAX_STR:
                raise ValueError("avro: bytes length out of range")
            raw = r.take(n)
            return raw.decode("utf-8") if schema == "string" else raw
        raise ValueError("avro: unknown primitive %r" % schema)
    t = schema.get("type")
    if t in _PRIMITIVES or isinstance(t, (list, dict)):
        # {"type": "string", "logicalType": ...} wrapper / inline nesting
        return _decode(r, t, names)
    if t == "record":
        _register(schema, names)
        return {
            f["name"]: _decode(r, f["type"], names)
            for f in schema.get("fields", ())
        }
    if t == "enum":
        _register(schema, names)
        idx = r.long()
        syms = schema.get("symbols", ())
        if not 0 <= idx < len(syms):
            raise ValueError("avro: enum index out of range")
        return syms[idx]
    if t == "fixed":
        _register(schema, names)
        size = int(schema.get("size", -1))
        if not 0 <= size <= _MAX_STR:
            raise ValueError("avro: fixed size out of range")
        return r.take(size)
    if t == "array":
        out = []
        while True:
            cnt = r.long()
            if cnt == 0:
                return out
            if cnt < 0:
                cnt = -cnt
                r.long()  # byte size of the block — unused when parsing
            if cnt > _MAX_ITEMS or len(out) + cnt > _MAX_ITEMS:
                raise ValueError("avro: array block over cap")
            for _ in range(cnt):
                out.append(_decode(r, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            cnt = r.long()
            if cnt == 0:
                return out
            if cnt < 0:
                cnt = -cnt
                r.long()
            if cnt > _MAX_ITEMS or len(out) + cnt > _MAX_ITEMS:
                raise ValueError("avro: map block over cap")
            for _ in range(cnt):
                n = r.long()
                if not 0 <= n <= _MAX_STR:
                    raise ValueError("avro: key length out of range")
                key = r.take(n).decode("utf-8")
                out[key] = _decode(r, schema["values"], names)
    raise ValueError("avro: unsupported schema %r" % t)


def _meta_map(r: _Reader) -> dict[str, bytes]:
    out: dict[str, bytes] = {}
    while True:
        cnt = r.long()
        if cnt == 0:
            return out
        if cnt < 0:
            cnt = -cnt
            r.long()
        if cnt > _MAX_ITEMS:
            raise ValueError("avro: metadata block over cap")
        for _ in range(cnt):
            n = r.long()
            if not 0 <= n <= _MAX_STR:
                raise ValueError("avro: meta key length out of range")
            key = r.take(n).decode("utf-8")
            n = r.long()
            if not 0 <= n <= _MAX_STR:
                raise ValueError("avro: meta value length out of range")
            out[key] = r.take(n)


def _snappy_block(data: bytes) -> bytes:
    """avro snappy codec: raw snappy + big-endian CRC-32 (zlib
    polynomial, NOT the framing format's masked CRC-32C) suffix."""
    import pyarrow as pa

    from open_semantic_etl_spark.operators.snappyf import _snappy_raw_size

    if len(data) < 4:
        raise ValueError("avro: short snappy block")
    body, crc = data[:-4], int.from_bytes(data[-4:], "big")
    size = _snappy_raw_size(body)
    if size > _MAX_STR:
        raise ValueError("avro: snappy block over cap")
    out = pa.decompress(body, decompressed_size=size, codec="snappy", asbytes=True)
    if zlib.crc32(out) & 0xFFFFFFFF != crc:
        raise ValueError("avro: snappy block CRC mismatch")
    return out


def read_avro(data: bytes, max_rows: int = 1_000_000) -> tuple[dict, list]:
    """object-container bytes → (schema-dict, rows).  Rows are Python
    values per the schema (records → dicts).  Raises ValueError on any
    malformation; stops silently at ``max_rows`` (cap, not an error —
    the caller charges its own budget)."""
    r = _Reader(data)
    if r.take(4) != _MAGIC:
        raise ValueError("avro: bad magic")
    meta = _meta_map(r)
    try:
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
    except (KeyError, UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError("avro: bad schema metadata") from e
    codec = meta.get("avro.codec", b"null").decode("latin-1")
    if codec not in ("null", "deflate", "snappy"):
        raise ValueError("avro: unsupported codec %r" % codec)
    sync = r.take(16)
    names: dict = {}
    if isinstance(schema, dict):  # pre-register the top-level named type
        if schema.get("type") in ("record", "enum", "fixed"):
            _register(schema, names)
    rows: list = []
    while not r.at_end():
        cnt = r.long()
        size = r.long()
        if cnt < 0 or cnt > _MAX_ITEMS or size < 0:
            raise ValueError("avro: block header out of range")
        block = r.take(size)
        if r.take(16) != sync:
            raise ValueError("avro: sync marker mismatch")
        if codec == "deflate":
            # cap BEFORE allocation (decompress() is unbounded; bufsize is
            # only an initial hint) — mirror the snappy path's _MAX_STR cap
            d = zlib.decompressobj(wbits=-15)
            block = d.decompress(block, _MAX_STR)
            # unconsumed_tail: input left over once the cap was hit;
            # not eof: the last consumed byte still had buffered output
            if d.unconsumed_tail or not d.eof:
                raise ValueError("avro: deflate block over cap")
        elif codec == "snappy":
            block = _snappy_block(block)
        br = _Reader(block)
        for _ in range(cnt):
            if len(rows) >= max_rows:
                return schema, rows
            rows.append(_decode(br, schema, names))
        if not br.at_end():
            raise ValueError("avro: trailing bytes in block")
    return schema, rows


# ---------------------------------------------------------------------------
# fixture encoder — the container ships no avro tooling; the reader is
# additionally pinned on a hand-assembled spec-literal file in tests
# (a shared encode/decode bug would cancel out in round-trips alone)
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(val, schema, names: dict) -> bytes:
    schema = _resolve(schema, names)
    if isinstance(schema, list):
        for i, branch in enumerate(schema):
            b = branch if isinstance(branch, str) else branch.get("type")
            if (val is None) == (b == "null"):
                return _zigzag(i) + _encode(val, branch, names)
        raise ValueError("no union branch for %r" % (val,))
    if isinstance(schema, str):
        if schema == "null":
            return b""
        if schema == "boolean":
            return b"\x01" if val else b"\x00"
        if schema in ("int", "long"):
            return _zigzag(int(val))
        if schema == "float":
            return struct.pack("<f", val)
        if schema == "double":
            return struct.pack("<d", val)
        if schema == "string":
            raw = val.encode("utf-8")
            return _zigzag(len(raw)) + raw
        if schema == "bytes":
            return _zigzag(len(val)) + bytes(val)
        raise ValueError("encode: unknown primitive %r" % schema)
    t = schema["type"]
    if t == "record":
        _register(schema, names)
        return b"".join(
            _encode(val[f["name"]], f["type"], names) for f in schema["fields"]
        )
    if t == "array":
        if not val:
            return _zigzag(0)
        body = b"".join(_encode(v, schema["items"], names) for v in val)
        return _zigzag(len(val)) + body + _zigzag(0)
    if t == "map":
        if not val:
            return _zigzag(0)
        body = b"".join(
            _encode(k, "string", names) + _encode(v, schema["values"], names)
            for k, v in val.items()
        )
        return _zigzag(len(val)) + body + _zigzag(0)
    if t == "enum":
        _register(schema, names)
        return _zigzag(schema["symbols"].index(val))
    if t == "fixed":
        _register(schema, names)
        return bytes(val)
    if t in _PRIMITIVES:
        return _encode(val, t, names)
    raise ValueError("encode: unsupported schema %r" % t)


def build_avro(rows: list, schema: dict, codec: str = "null") -> bytes:
    """rows (dicts per the record schema) → object-container bytes.
    Deterministic: fixed sync marker (this is a fixture writer, not a
    production encoder)."""
    names: dict = {}
    sync = bytes(range(16))
    meta_schema = json.dumps(schema, separators=(",", ":")).encode()
    meta = (
        _zigzag(2)
        + _zigzag(len("avro.schema"))
        + b"avro.schema"
        + _zigzag(len(meta_schema))
        + meta_schema
        + _zigzag(len("avro.codec"))
        + b"avro.codec"
        + _zigzag(len(codec))
        + codec.encode()
        + _zigzag(0)
    )
    body = b"".join(_encode(row, schema, names) for row in rows)
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        body = comp.compress(body) + comp.flush()
    elif codec == "snappy":
        import pyarrow as pa

        crc = zlib.crc32(body) & 0xFFFFFFFF
        body = (
            pa.compress(body, codec="snappy", asbytes=True)
            + crc.to_bytes(4, "big")
        )
    elif codec != "null":
        raise ValueError("unsupported codec %r" % codec)
    return (
        _MAGIC
        + meta
        + sync
        + _zigzag(len(rows))
        + _zigzag(len(body))
        + body
        + sync
    )
