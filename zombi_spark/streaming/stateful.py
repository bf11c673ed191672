"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference computes per-key session/window state inside its native
engine; the Spark-first form is arbitrary per-key state over micro-batches
(SURVEY §2.6 W3 / §2.10). ``transformWithStateInPandas`` (the newer API)
is unusable in this container — its state-server Python worker imports
``google.protobuf``, which does not ship — but the classic
``applyInPandasWithState`` path has no such dependency (verified) and
carries the same semantics: per-group pandas batches + a GroupState that
survives across micro-batches in the checkpointed state store.

Scale notes: state is per-key O(1) (three longs per open session); the
only shuffle is the groupBy key exchange Structured Streaming already
requires for stateful ops; batches arrive Arrow-encoded. At 100 TB the
state store backend (RocksDB provider) is a config, not a code change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from zombi_spark.shipping import ensure_package_on_workers

SESSION_SCHEMA = "user_id long, session_start long, session_end long, n_events long"
_STATE_SCHEMA = "session_start long, last_ts long, n_events long"


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    key_col: str = "topic",
    ts_col: str = "timestamp_ms",
) -> DataFrame:
    """Event-time windowed counts with a watermark — the built-in
    Structured Streaming form of the reference's hour rollups (A7/W3):
    late events inside the watermark still land in their window; events
    later than the watermark are DROPPED, and in append mode a window
    emits exactly once, after the watermark passes its end.

    At scale this is one shuffle on (key, window) with partial
    aggregation and watermark-bounded state — the state store holds only
    open windows, not history. (Spark applies an advanced watermark to
    input filtering one batch after the advancing data arrives — tested
    in test_stateful_streaming.py.)
    """
    from pyspark.sql import functions as F

    ts = F.timestamp_millis(F.col(ts_col)).alias("event_time")
    win = F.window(F.col("event_time"), window, slide) if slide else F.window(
        F.col("event_time"), window
    )
    return (
        events.withColumn("event_time", ts)
        .withWatermark("event_time", watermark)
        .groupBy(F.col(key_col), win.alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.unix_millis(F.col("win.start")).alias("window_start_ms"),
            F.unix_millis(F.col("win.end")).alias("window_end_ms"),
            "n_events",
        )
    )


def dedup_stream_within_watermark(
    events: DataFrame,
    watermark: str = "2 hours",
    key_cols: tuple[str, ...] = ("topic", "partition", "idempotency_key"),
    ts_col: str = "timestamp_ms",
) -> DataFrame:
    """In-STREAM first-wins idempotency dedup with watermark-bounded state
    (``dropDuplicatesWithinWatermark``) — the streaming first pass of D1:
    replays that arrive within the watermark are suppressed before the
    sink ever sees them; the table-side retention-window anti-join
    (EventTable.idempotency_history) remains the durable second pass for
    replays that arrive later or across restarts.

    State is one entry per key within the watermark horizon — the same
    retention-bounded memory contract as the reference's RocksDB dedup
    index (rocksdb.rs:645-654 + its retention delete).

    Within a single micro-batch the kept row follows Spark's processing
    order (best-effort arrival order); the DETERMINISTIC first-wins rule
    is enforced downstream by prepare_events' arrival-ordered window —
    this stage exists to shed replay volume early, not to define winners.
    """
    from pyspark.sql import functions as F

    with_time = events.withColumn(
        "event_time", F.timestamp_millis(F.col(ts_col))
    ).withWatermark("event_time", watermark)
    # unkeyed events must pass through untouched: null keys are not
    # duplicates of each other (SPEC.md:752 contract)
    keyed = with_time.where(F.col(key_cols[-1]).isNotNull()).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
    unkeyed = with_time.where(F.col(key_cols[-1]).isNull())
    return keyed.unionByName(unkeyed).drop("event_time")


def sessionize_stream(
    events: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    key_col: str = "user_id",
    ts_col: str = "timestamp_ms",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming sessionization: one output row per CLOSED session
    (closed when a same-key event arrives more than ``gap_ms`` after the
    previous one, or when ``idle_timeout_ms`` of processing time passes
    with no events for the key).

    The open session rides in GroupState across micro-batches — the
    batch analogue is q_sessionization's window/gap logic; this is the
    same computation with O(1) state per key instead of a shuffle over
    history.

    Cross-batch LATE events (intra-batch order is sorted here): an event
    inside or within ``gap_ms`` of the open session's [start, end] span
    EXTENDS the session's bounds (min/max — the end can never regress
    below the start); an ANCIENT straggler more than a gap before the
    span is emitted as its own single-event session and the open
    session stays untouched — closing the live session for it would
    mis-split the very next in-gap event. NULL keys sessionize as their
    own group (the schema's key column is nullable); events with a NULL
    timestamp are dropped (they cannot be placed in time); ``key_col``
    must be an integral column matching SESSION_SCHEMA's first field.
    """
    ensure_package_on_workers(events.sparkSession)
    gap = int(gap_ms)
    idle = idle_timeout_ms

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # a NULL group key must not crash the query (int(None) would;
        # Arrow surfaces a nullable long key as float NaN in pandas);
        # its events sessionize under the null key
        user = None if key[0] is None or pd.isna(key[0]) else int(key[0])
        cols = ["user_id", "session_start", "session_end", "n_events"]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([(user, start, last, n)], columns=cols)
            return
        start = last = None
        n = 0
        if state.exists:
            start, last, n = state.get
        closed: list[tuple] = []
        ts_all: list[int] = []
        for pdf in pdfs:
            # a NULL timestamp (NaN through Arrow) cannot be placed in
            # time — drop it rather than kill the query on int(NaN)
            ts_all.extend(int(t) for t in pdf[ts_col] if not pd.isna(t))
        for ts in sorted(ts_all):
            if last is not None and start - ts > gap:
                # ancient straggler, more than a gap BEFORE the open
                # span: its own single-event session — closing the live
                # session for it would mis-split the next in-gap event
                closed.append((user, ts, ts, 1))
                continue
            if last is not None and ts - last > gap:
                closed.append((user, start, last, n))
                start = last = None
                n = 0
            if start is None:
                start = last = ts
            else:
                # min/max so a late-but-in-session event can never
                # regress the end below the start
                start = min(start, ts)
                last = max(last, ts)
            n += 1
        if start is not None:
            state.update((start, last, n))
            if idle is not None:
                state.setTimeoutDuration(idle)
        yield pd.DataFrame(closed, columns=cols)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        _fn, SESSION_SCHEMA, _STATE_SCHEMA, "append", timeout
    )
