"""Custom stateful streaming (applyInPandasWithState): sessionization
whose open-session state survives micro-batch boundaries — the W3/§2.10
arbitrary-state surface the native engine keeps in its session store."""

import json
import os

from zombi_spark.streaming.stateful import sessionize_stream

GAP = 10 * 60 * 1000  # 10 min
T0 = 1700000000000


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as fh:
        for u, ts in rows:
            fh.write(json.dumps({"user_id": u, "timestamp_ms": ts}) + "\n")


def test_sessionization_state_crosses_micro_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # file 1: user 1 opens a session (3 events, 1-min apart);
    #         user 2 opens one event
    _write(src, "f1.json", [(1, T0), (1, T0 + 60_000), (1, T0 + 120_000), (2, T0)])
    # file 2 (separate micro-batch via maxFilesPerTrigger=1):
    #   user 1: event 5 min after last — same session continues;
    #   user 2: event 3 HOURS later — closes session 1, opens session 2
    _write(src, "f2.json", [(1, T0 + 420_000), (2, T0 + 3 * 3600_000)])
    # file 3: user 1 event far in the future — closes the 4-event session
    _write(src, "f3.json", [(1, T0 + 9 * 3600_000)])

    stream = (
        spark.readStream.schema("user_id long, timestamp_ms long")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = (
        sessionize_stream(stream, gap_ms=GAP)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("select * from sessions").collect()
    }
    # user 1's first session spans files 1+2 (4 events) — state crossed
    # the batch boundary; closed by file 3's late event
    assert (1, T0, T0 + 420_000, 4) in rows
    # user 2's single-event session closed by the 3-hour gap
    assert (2, T0, T0, 1) in rows
    # open sessions (u1@+9h, u2@+3h) are NOT emitted — still in state
    assert len(rows) == 2


def test_stream_dedup_within_watermark(spark, tmp_path):
    """In-stream idempotency dedup: keyed replays within the watermark are
    suppressed before the sink; unkeyed events pass through untouched."""
    from zombi_spark.streaming.stateful import dedup_stream_within_watermark

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)

    def _w(name, rows):
        p = os.path.join(src, name)
        with open(p, "w") as fh:
            for key, order in rows:
                fh.write(
                    json.dumps(
                        {
                            "topic": "t",
                            "partition": 0,
                            "idempotency_key": key,
                            "timestamp_ms": T0 + order,
                            "ingest_order": order,
                        }
                    )
                    + "\n"
                )

    # originals + same-batch replays + unkeyed events
    _w("f1.json", [("a", 1), ("b", 2), ("a", 3), (None, 4), (None, 5)])
    # next batch: replay of 'b' (within watermark) + a new key
    _w("f2.json", [("b", 6), ("c", 7)])

    stream = spark.readStream.schema(
        "topic string, partition int, idempotency_key string, "
        "timestamp_ms long, ingest_order long"
    ).json(src)
    q = (
        dedup_stream_within_watermark(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from dedup_out").collect()
    keyed = sorted(
        (r.idempotency_key, r.ingest_order) for r in rows if r.idempotency_key
    )
    # first-wins: one row per key, the earliest arrival
    assert keyed == [("a", 1), ("b", 2), ("c", 7)]
    # both unkeyed events survive
    assert sorted(r.ingest_order for r in rows if r.idempotency_key is None) == [4, 5]


def test_windowed_counts_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed counts: a window emits once the watermark
    (2h) passes its end, and an event arriving AFTER the watermark has
    moved past its window is dropped — the T9/late-data contract."""
    from zombi_spark.streaming.stateful import windowed_event_counts

    src = str(tmp_path / "src")
    H = 3600_000
    seq = [0]

    def _w(name, rows):
        os.makedirs(src, exist_ok=True)
        p = os.path.join(src, name)
        with open(p, "w") as fh:
            for topic, ts in rows:
                fh.write(json.dumps({"topic": topic, "timestamp_ms": ts}) + "\n")
        # the file source batches by modification time: rapid writes can
        # tie and reorder batches, so pin strictly increasing mtimes
        seq[0] += 10
        os.utime(p, (1_000_000_000 + seq[0], 1_000_000_000 + seq[0]))

    # batch 1: 3 events in hour-0, 1 in hour-1  → watermark = max - 2h
    _w("f1.json", [("t", T0), ("t", T0 + 1000), ("t", T0 + 2000), ("t", T0 + H)])
    # batch 2: event at +5h → watermark will pass hour-0 and hour-1 ends
    _w("f2.json", [("t", T0 + 5 * H)])
    # batch 3: neutral event — lets the advanced watermark take effect
    # (Spark applies the updated watermark to input filtering one batch
    # after the advancing data arrives)
    _w("f3.json", [("t", T0 + 5 * H + 1000)])
    # batch 4: LATE event for hour-0, far beyond the watermark → dropped
    _w("f4.json", [("t", T0 + 10)])
    # batch 5: advance watermark again so any (wrongly) accepted late row
    # would have been emitted by now
    _w("f5.json", [("t", T0 + 9 * H)])

    stream = (
        spark.readStream.schema("topic string, timestamp_ms long")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.window_start_ms, r.n_events)
        for r in spark.sql("select * from win_counts").collect()
    }
    W0 = T0 - (T0 % H)  # windows are clock-aligned
    assert (W0, 3) in rows  # hour-0: exactly the 3 on-time events
    assert (W0 + H, 1) in rows  # hour-1 emitted once watermark passed
    # the late hour-0 event neither re-emitted nor updated the count
    assert (W0, 4) not in rows


def test_sessionization_resume_from_checkpoint(spark, tmp_path):
    """The open session survives a full query restart (checkpointed
    state store), then closes from a post-restart event."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write(src, "f1.json", [(7, T0), (7, T0 + 60_000)])

    def run():
        stream = (
            spark.readStream.schema("user_id long, timestamp_ms long").json(src)
        )
        q = (
            sessionize_stream(stream, gap_ms=GAP)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()  # batch 1: opens the session, emits nothing
    _write(src, "f2.json", [(7, T0 + 5 * 3600_000)])
    run()  # new query instance, same checkpoint: state store restores
    rows = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    ]
    assert rows == [(7, T0, T0 + 60_000, 2)]


def test_late_event_cannot_regress_session_end(spark, tmp_path):
    """A cross-batch LATE event inside the open session's span extends
    bounds via min/max — it must never produce session_end <
    session_start (the `last = ts` regression) or mis-split the
    follow-on events; null keys sessionize instead of crashing."""
    src = str(tmp_path / "src")
    # batch 1: user 1 opens at T0+120s
    _write(src, "f1.json", [(1, T0 + 120_000), (None, T0)])
    # batch 2: a LATE event 60s BEFORE the session start (within gap) —
    # must extend the session backwards, not regress its end
    _write(src, "f2.json", [(1, T0 + 60_000)])
    # batch 3: an ANCIENT straggler (2h before the span) — emitted as
    # its own single-event session, the open session left untouched
    _write(src, "f2b.json", [(1, T0 - 2 * 3600_000)])
    # batch 4: an event one minute later continues the session (would be
    # mis-split if `last` had regressed OR if the straggler had closed
    # the live session); far-future closes everything
    _write(src, "f3.json", [(1, T0 + 180_000)])
    _write(src, "f4.json", [(1, T0 + 9 * 3600_000), (None, T0 + 9 * 3600_000)])
    # the file source orders batches by MODIFICATION TIME — fast
    # successive writes can tie (and then order arbitrarily), so pin
    # strictly increasing mtimes to make the batch sequence the test's
    for i, name in enumerate(["f1.json", "f2.json", "f2b.json", "f3.json", "f4.json"]):
        os.utime(os.path.join(src, name), (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("user_id long, timestamp_ms long")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = (
        sessionize_stream(stream, gap_ms=GAP)
        .writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("select * from late_sessions").collect()
    ]
    for _u, start, end, _n in rows:
        assert end >= start, f"regressed session bounds: {rows}"
    # ONE session for user 1 spanning the late event through batch 4 —
    # neither the regression nor the straggler split it
    assert (1, T0 + 60_000, T0 + 180_000, 3) in rows
    # the ancient straggler became its own single-event session
    assert (1, T0 - 2 * 3600_000, T0 - 2 * 3600_000, 1) in rows
    # the null-key group sessionized rather than crashing the query
    assert (None, T0, T0, 1) in rows
