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


# ---------------------------------------------------------------- L6 fuzz
# The reference fuzzes the proto decoder with arbitrary bytes
# (fuzz/fuzz_targets/fuzz_proto.rs). Same intent via hypothesis: the
# decoder must either return a well-typed dict or raise ProtoDecodeError
# — never any other exception, never values outside the table's types
# (an out-of-int64 timestamp would kill the whole Arrow batch, not just
# the poison row).
from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.binary(max_size=256))
@settings(max_examples=500, deadline=None)
def test_fuzz_decode_event_total(buf):
    try:
        ev = decode_event(buf)
    except ProtoDecodeError:
        return
    assert isinstance(ev["payload"], bytes)
    if ev["timestamp_ms"] is not None:
        assert -(2**63) <= ev["timestamp_ms"] < 2**63
    if ev["idempotency_key"] is not None:
        assert isinstance(ev["idempotency_key"], str)


@given(st.binary(max_size=256))
@settings(max_examples=500, deadline=None)
def test_fuzz_decode_bulk_total(buf):
    try:
        records = decode_bulk_write_request(buf)
    except ProtoDecodeError:
        return
    for rec in records:
        assert 0 <= rec["partition"] <= 0x7FFFFFFF
        if rec["timestamp_ms"] is not None:
            assert -(2**63) <= rec["timestamp_ms"] < 2**63


def test_ten_byte_varint_truncates_to_64_bits():
    """A hostile 10-byte varint carrying bits past 2^64 must truncate
    (proto semantics), not produce an unrepresentable Python int."""
    blob = b"\x10" + b"\xff" * 9 + b"\x01"  # field 2 (timestamp), huge varint
    ev = decode_event(blob)
    assert ev["timestamp_ms"] == -1  # 2^64-1 truncated → two's complement -1


def test_fuzz_poison_rows_never_kill_the_batch(spark):
    """Arrow-batched decode over a pile of random blobs + valid rows:
    every input row comes back exactly once, malformed ones tagged."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(64):
        rows.append(("t", 0, bytearray(rng.randbytes(rng.randint(0, 64))), i))
    good = encode_event(b'{"ok":1}', timestamp_ms=1704067200000)
    rows.append(("t", 0, bytearray(good), 64))
    raw = spark.createDataFrame(
        rows, "topic string, partition int, body binary, ingest_order long"
    )
    out = decode_proto_events(raw).collect()
    assert len(out) == 65
    assert {r.ingest_order for r in out} == set(range(65))
    ok = [r for r in out if r.ingest_order == 64][0]
    assert ok.decode_error is None and ok.payload == b'{"ok":1}'
