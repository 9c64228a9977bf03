"""Minimal pure-Python Avro Object Container File codec, implemented
from the PUBLIC Avro 1.11 specification (binary encoding + object
container file layout).  This is the fallback engine behind
``read_avro`` / ``write_avro`` when the deployment lacks the external
spark-avro JVM module: files it writes are standard Avro container
files any Avro reader accepts, and it reads standard container files
with ``null`` or ``deflate`` codecs.

Scope (covers what a Spark DataFrame roundtrip needs):
- primitives: null, boolean, int, long, float, double, bytes, string
- complex: record (top level + nested), array, map, union
  (nullability via ``["null", T]``)
- logical types: date (int), timestamp-micros / local-timestamp-micros
  (long) — the natural images of Spark's date / timestamp /
  timestamp_ntz
- codecs: null, deflate (raw RFC-1951 via zlib)

Everything here is per-file bytes-in/rows-out (or rows-in/bytes-out),
so the Spark layer can run it inside Arrow-batched executors — the
codec itself never touches Spark.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC_SIZE = 16


# --- binary primitives (Avro spec: binary encoding) ------------------------


def _write_long(buf: io.BytesIO, n: int) -> None:
    # zigzag then base-128 varint
    n = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_long(buf) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf) -> bytes:
    return buf.read(_read_long(buf))


# --- schema-driven value codec ---------------------------------------------


def _encode_value(buf: io.BytesIO, schema, value) -> None:
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                _write_long(buf, i)
                _encode_value(buf, branch, value)
                return
        raise ValueError(f"value {value!r} matches no union branch {schema}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "string":
        _write_bytes(buf, value.encode("utf-8"))
    elif t == "record":
        for f in schema["fields"]:
            _encode_value(buf, f["type"], value.get(f["name"]))
    elif t == "array":
        items = list(value)
        if items:
            _write_long(buf, len(items))
            for it in items:
                _encode_value(buf, schema["items"], it)
        _write_long(buf, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, str(k).encode("utf-8"))
                _encode_value(buf, schema["values"], v)
        _write_long(buf, 0)
    else:
        raise ValueError(f"unsupported avro type: {t!r}")


def _matches(branch, value) -> bool:
    t = branch["type"] if isinstance(branch, dict) else branch
    return (value is None) == (t == "null")


def _decode_value(buf, schema):
    if isinstance(schema, list):  # union
        return _decode_value(buf, schema[_read_long(buf)])
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "record":
        return {f["name"]: _decode_value(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # negative count: byte size follows (spec)
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_decode_value(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode_value(buf, schema["values"])
    raise ValueError(f"unsupported avro type: {t!r}")


# --- container files --------------------------------------------------------


def write_container(records: "list[dict]", schema: dict, codec: str = "deflate") -> bytes:
    """Serialize records (already in avro-native Python form) into one
    Object Container File's bytes."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    sync = os.urandom(SYNC_SIZE)
    out.write(sync)
    if records:
        block = io.BytesIO()
        for rec in records:
            _encode_value(block, schema, rec)
        data = block.getvalue()
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = comp.compress(data) + comp.flush()
        _write_long(out, len(records))
        _write_long(out, len(data))
        out.write(data)
        out.write(sync)
    return out.getvalue()


def read_container(payload: bytes) -> "tuple[dict, list[dict]]":
    """Parse one container file's bytes -> (schema, records)."""
    buf = io.BytesIO(payload)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = buf.read(SYNC_SIZE)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n = _read_long(buf)
        size = _read_long(buf)
        data = buf.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        block = io.BytesIO(data)
        for _ in range(n):
            records.append(_decode_value(block, schema))
        if buf.read(SYNC_SIZE) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, records


def read_schema(payload_head: bytes) -> dict:
    """Schema from a container file's header bytes only (no blocks)."""
    buf = io.BytesIO(payload_head)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    return json.loads(meta["avro.schema"].decode("utf-8"))
