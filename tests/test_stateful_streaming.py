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
