"""Protobuf wire decode tests (S2/S3 proto path; fuzz-ish malformed inputs
mirror the reference's fuzz_proto target, fuzz/fuzz_targets)."""

import pytest

from zombi_spark.ingest.protobuf import (
    ProtoDecodeError,
    decode_bulk_write_request,
    decode_event,
    decode_proto_events,
    encode_event,
)


def test_event_roundtrip():
    buf = encode_event(b'{"a":1}', timestamp_ms=1704067200123, idempotency_key="k-1")
    ev = decode_event(buf)
    assert ev["payload"] == b'{"a":1}'
    assert ev["timestamp_ms"] == 1704067200123
    assert ev["idempotency_key"] == "k-1"


def test_event_defaults():
    ev = decode_event(encode_event(b"x"))
    assert ev["payload"] == b"x" and ev["timestamp_ms"] is None and ev["idempotency_key"] is None


def test_negative_timestamp_two_complement():
    # proto3 int64 negative values encode as 10-byte varints
    buf = encode_event(b"x", timestamp_ms=-5)
    assert decode_event(buf)["timestamp_ms"] == -5


def test_malformed_inputs_rejected():
    for bad in [b"\x0a\xff", b"\x80" * 12, b"\x0a\x05ab"]:
        with pytest.raises(ProtoDecodeError):
            decode_event(bad)
    # unknown fields are skipped, not fatal (proto3 semantics)
    assert decode_event(b"\x28\x01\x0a\x01z")["payload"] == b"z"


def test_bulk_request():
    rec = encode_event(b"p1", timestamp_ms=5)
    # BulkWriteRequest{records=1}: wrap as field 1 wire 2
    wrapped = b"\x0a" + bytes([len(rec)]) + rec
    out = decode_bulk_write_request(wrapped + wrapped)
    assert len(out) == 2 and out[0]["payload"] == b"p1"


def test_decode_proto_events_dataframe(spark):
    good = encode_event(b'{"v":1}', timestamp_ms=1704067200000)
    rows = [("t", 0, bytearray(good), 0), ("t", 1, bytearray(b"\x0a\xff"), 1)]
    raw = spark.createDataFrame(
        rows, "topic string, partition int, body binary, ingest_order long"
    )
    out = {r.ingest_order: r for r in decode_proto_events(raw).collect()}
    assert out[0].payload == b'{"v":1}' and out[0].decode_error is None
    assert out[1].decode_error is not None  # poison row isolated, batch survives
