"""Minimal Apache Avro binary codec (Object Container Files, null codec).

The container ships no Avro library (fastavro/avro absent — verified),
but Iceberg manifests and manifest lists ARE Avro files
(iceberg_storage.rs:767-823, 1055-1110 writes them with apache-avro;
447-515 decodes committed watermarks back out of them), so a real
interop story needs one. This module implements exactly the subset of
the Avro 1.11 specification those files use, from the public spec:

  - primitives: null, boolean, int, long (zigzag varint), string, bytes
  - complex: record, union, array, map (block-encoded)
  - Object Container File framing: magic ``Obj\\x01``, file-metadata map
    (``avro.schema`` + ``avro.codec``), 16-byte sync marker, data blocks
    of (object count, byte size, objects, sync)

Writer and reader are independent halves: the reader is schema-driven
off the ``avro.schema`` JSON embedded in the file header — never off
in-process state — so a round-trip test through it validates the bytes
the same way an external Avro reader would.
"""

from __future__ import annotations

import json
import os

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- encoding
def encode_long(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)  # arithmetic shift keeps sign handling exact
    z &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_bytes(b: bytes) -> bytes:
    return encode_long(len(b)) + b


def _encode_string(s: str) -> bytes:
    return _encode_bytes(s.encode("utf-8"))


def encode_value(schema, value) -> bytes:
    """Encode ``value`` per ``schema`` (parsed Avro schema JSON: str for
    primitives, dict for record/array/map, list for union)."""
    out = bytearray()
    _encode_into(schema, value, out)
    return bytes(out)


def _encode_into(schema, value, out: bytearray) -> None:
    """Append ``value``'s encoding to ``out`` — one growable buffer
    threaded through the recursion instead of a bytes allocation +
    concatenation per node (manifest commits encode tens of thousands
    of nodes per append; measured ~2× on the commit's manifest write,
    byte-identical output — pinned by the golden fixtures and the
    JVM-Avro cross-decode)."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, dict):
        t = schema["type"]
    elif isinstance(schema, list):  # union: index + encoded branch
        idx = _union_branch(schema, value)
        out += encode_long(idx)
        _encode_into(schema[idx], value, out)
        return
    else:
        raise TypeError(f"unsupported schema node: {schema!r}")

    if t == "null":
        return
    if t == "boolean":
        out += b"\x01" if value else b"\x00"
        return
    if t in ("int", "long"):
        out += encode_long(int(value))
        return
    if t == "string":
        b = value.encode("utf-8")
        out += encode_long(len(b))
        out += b
        return
    if t == "bytes":
        b = bytes(value)
        out += encode_long(len(b))
        out += b
        return
    if t == "record":
        for f in schema["fields"]:
            _encode_into(f["type"], value[f["name"]], out)
        return
    if t == "array":
        if not value:
            out += encode_long(0)
            return
        out += encode_long(len(value))
        items_schema = schema["items"]
        for item in value:
            _encode_into(items_schema, item, out)
        out += encode_long(0)
        return
    if t == "map":
        if not value:
            out += encode_long(0)
            return
        out += encode_long(len(value))
        values_schema = schema["values"]
        for k, v in value.items():
            out += _encode_string(k)
            _encode_into(values_schema, v, out)
        out += encode_long(0)
        return
    raise TypeError(f"unsupported Avro type: {t}")


def _union_branch(union: list, value) -> int:
    """Pick the union branch for a Python value (the null/non-null split
    is the only union shape Iceberg manifests use)."""
    for i, branch in enumerate(union):
        if value is None and branch == "null":
            return i
        if value is not None and branch != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {union!r}")


def write_container(path: str, schema: dict, records: list, metadata: dict | None = None) -> None:
    """Write an Avro Object Container File (null codec, single block)."""
    schema_json = json.dumps(schema)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": b"null"}
    for k, v in (metadata or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else v
    # deterministic sync marker from content would break the "random"
    # expectation of some readers; os.urandom is fine (not replayed)
    sync = os.urandom(16)

    body = bytearray()
    for rec in records:
        _encode_into(schema, rec, body)

    out = bytearray(MAGIC)
    out += encode_long(len(meta))
    for k, v in meta.items():
        out += _encode_string(k)
        out += _encode_bytes(v)
    out += encode_long(0)
    out += sync
    if records:
        out += encode_long(len(records))
        out += encode_long(len(body))
        out += body
        out += sync
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(out)
    os.replace(tmp, path)


# ---------------------------------------------------------------- decoding
class _Reader:
    """Cursor over the raw buffer — indexes ``bytes`` directly instead of
    wrapping BytesIO: a manifest decode calls read_long per value, and the
    per-byte ``io.read(1)`` allocation was the decode hot spot (~2× on the
    commit-path manifest re-read; byte-identical semantics, EOFError on
    truncation either way)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def tell(self) -> int:
        return self.pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated Avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        buf = self.buf
        pos = self.pos
        shift = 0
        acc = 0
        try:
            while True:
                b = buf[pos]
                pos += 1
                acc |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
        except IndexError:
            raise EOFError("truncated Avro data") from None
        self.pos = pos
        return (acc >> 1) ^ -(acc & 1)  # un-zigzag

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")


def decode_value(schema, r: _Reader):
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, dict):
        t = schema["type"]
    elif isinstance(schema, list):
        return decode_value(schema[r.read_long()], r)
    else:
        raise TypeError(f"unsupported schema node: {schema!r}")

    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.read_long()
    if t == "string":
        return r.read_string()
    if t == "bytes":
        return r.read_bytes()
    if t == "record":
        return {f["name"]: decode_value(f["type"], r) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            count = r.read_long()
            if count == 0:
                return out
            if count < 0:  # block with byte-size prefix
                count = -count
                r.read_long()
            for _ in range(count):
                out.append(decode_value(schema["items"], r))
    if t == "map":
        out = {}
        while True:
            count = r.read_long()
            if count == 0:
                return out
            if count < 0:
                count = -count
                r.read_long()
            for _ in range(count):
                k = r.read_string()
                out[k] = decode_value(schema["values"], r)
    raise TypeError(f"unsupported Avro type: {t}")


def read_container(path: str) -> tuple[dict, dict, list]:
    """Read an Avro Object Container File written by ANY writer (schema
    comes from the file's own header). Returns (schema, metadata,
    records)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:4] != MAGIC:
        raise ValueError(f"not an Avro container file: {path}")
    r = _Reader(buf[4:])
    meta: dict[str, bytes] = {}
    while True:
        count = r.read_long()
        if count == 0:
            break
        if count < 0:
            count = -count
            r.read_long()
        for _ in range(count):
            k = r.read_string()
            meta[k] = r.read_bytes()
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"unsupported Avro codec: {codec!r}")
    schema = json.loads(meta["avro.schema"].decode())
    sync = r.read(16)
    records = []
    while r.tell() < len(buf) - 4:
        n = r.read_long()
        r.read_long()  # block byte size
        for _ in range(n):
            records.append(decode_value(schema, r))
        if r.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt Avro block)")
    return schema, meta, records
