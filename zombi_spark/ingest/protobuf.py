"""Protobuf event decoding (S2/S3 protobuf path, reference proto/event.proto).

The container ships neither the spark-protobuf jar nor the ``protobuf``
Python package, so this module implements the small proto3 wire subset the
reference's messages need (varint + length-delimited fields) and exposes it
as an Arrow-batched ``mapInPandas`` decoder — the documented slow path for
an edge format Spark's built-ins can't express here. With spark-protobuf
available, ``from_protobuf(col, "Event", descriptor)`` replaces this with
a JVM-side expression; the call site contract is identical.

Wire format handled (proto3):
  Event           {bytes payload=1; int64 timestamp_ms=2;
                   string idempotency_key=3; map<string,string> headers=4}
  BulkWriteRecord {bytes payload=1; uint32 partition=2;
                   int64 timestamp_ms=3; string idempotency_key=4}
  BulkWriteRequest{repeated BulkWriteRecord records=1}

Headers are decoded but not persisted to the table — matching the
reference, which drops them at storage time (SPEC.md:433-438).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class ProtoDecodeError(ValueError):
    """Malformed protobuf input (the reference returns HTTP 400)."""


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ProtoDecodeError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            # proto varints truncate to 64 bits (the 10th byte can carry
            # bits past 2^64); without the mask a hostile blob yields a
            # Python int outside int64 and the Arrow batch build throws —
            # a poison row would kill the whole job (found by fuzz)
            return result & ((1 << 64) - 1), pos
        shift += 7
        if shift > 63:
            raise ProtoDecodeError("varint too long")


def _read_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) triples."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ProtoDecodeError("truncated length-delimited field")
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # fixed32 (tolerated, skipped)
            if pos + 4 > len(buf):
                raise ProtoDecodeError("truncated fixed32")
            val = buf[pos : pos + 4]
            pos += 4
        elif wire == 1:  # fixed64 (tolerated, skipped)
            if pos + 8 > len(buf):
                raise ProtoDecodeError("truncated fixed64")
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ProtoDecodeError(f"unsupported wire type {wire}")
        yield field, wire, val


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def decode_event(buf: bytes) -> dict:
    """Decode a zombi ``Event`` message."""
    out = {"payload": b"", "timestamp_ms": None, "idempotency_key": None, "headers": {}}
    for field, wire, val in _read_fields(buf):
        if field == 1 and wire == 2:
            out["payload"] = val
        elif field == 2 and wire == 0:
            out["timestamp_ms"] = _to_signed64(val)
        elif field == 3 and wire == 2:
            out["idempotency_key"] = val.decode("utf-8", errors="replace") or None
        elif field == 4 and wire == 2:
            k, v = b"", b""
            for mf, mw, mv in _read_fields(val):
                if mf == 1 and mw == 2:
                    k = mv
                elif mf == 2 and mw == 2:
                    v = mv
            out["headers"][k.decode("utf-8", "replace")] = v.decode("utf-8", "replace")
    return out


def decode_bulk_write_record(buf: bytes) -> dict:
    out = {"payload": b"", "partition": 0, "timestamp_ms": None, "idempotency_key": None}
    for field, wire, val in _read_fields(buf):
        if field == 1 and wire == 2:
            out["payload"] = val
        elif field == 2 and wire == 0:
            # proto uint32 semantics: truncate the varint to 32 bits; a
            # value past i32 (the table's partition type) is a malformed
            # request, not a crash (the reference's u32 → 400 boundary)
            part = int(val) & 0xFFFFFFFF
            if part > 0x7FFFFFFF:
                raise ProtoDecodeError(f"partition {part} out of range")
            out["partition"] = part
        elif field == 3 and wire == 0:
            out["timestamp_ms"] = _to_signed64(val)
        elif field == 4 and wire == 2:
            out["idempotency_key"] = val.decode("utf-8", errors="replace") or None
    return out


def decode_bulk_write_request(buf: bytes) -> list[dict]:
    records = []
    for field, wire, val in _read_fields(buf):
        if field == 1 and wire == 2:
            records.append(decode_bulk_write_record(val))
    return records


def encode_event(payload: bytes, timestamp_ms: int | None = None, idempotency_key: str | None = None) -> bytes:
    """Minimal encoder (tests/producers)."""

    def varint(v: int) -> bytes:
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    buf = bytearray()
    buf += b"\x0a" + varint(len(payload)) + payload  # field 1, wire 2
    if timestamp_ms is not None:
        buf += b"\x10" + varint(timestamp_ms & ((1 << 64) - 1))  # field 2, wire 0
    if idempotency_key:
        kb = idempotency_key.encode()
        buf += b"\x1a" + varint(len(kb)) + kb  # field 3, wire 2
    return bytes(buf)


DECODED_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("timestamp_ms", T.LongType(), True),
        T.StructField("idempotency_key", T.StringType(), True),
        T.StructField("ingest_order", T.LongType(), False),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def decode_proto_events(raw: DataFrame) -> DataFrame:
    """Arrow-batched decode of proto ``Event`` blobs.

    Input columns: (topic string, partition int, body binary,
    ingest_order long) — the HTTP edge shape (partition from the
    X-Partition header, handlers.rs:494-520). Malformed rows surface in
    ``decode_error`` instead of failing the batch (the reference 400s the
    single request; in a batch engine the poison row must not kill the
    job)."""
    from zombi_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers(raw.sparkSession)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for topic, part, body, order in zip(
                pdf["topic"], pdf["partition"], pdf["body"], pdf["ingest_order"]
            ):
                try:
                    ev = decode_event(bytes(body))
                    rows.append(
                        {
                            "topic": topic,
                            "partition": int(part),
                            "payload": ev["payload"],
                            "timestamp_ms": ev["timestamp_ms"],
                            "idempotency_key": ev["idempotency_key"],
                            "ingest_order": order,
                            "decode_error": None,
                        }
                    )
                except ProtoDecodeError as e:
                    rows.append(
                        {
                            "topic": topic,
                            "partition": int(part),
                            "payload": b"",
                            "timestamp_ms": None,
                            "idempotency_key": None,
                            "ingest_order": order,
                            "decode_error": str(e),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_EVENT_SCHEMA.fields])

    return raw.mapInPandas(_decode, DECODED_EVENT_SCHEMA)
