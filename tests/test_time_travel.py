"""Snapshot reads (time travel), SQL view surface, and source rate limiting."""

import json
import os

import pyspark.sql.functions as F
import pytest

from zombi_spark.ingest.batch import RAW_EVENT_SCHEMA, prepare_events
from zombi_spark.streaming.ingest import StreamingIngest
from zombi_spark.table.event_table import EventTable


def _batch(spark, start, n):
    rows = [("t", 0, f"p{i}".encode(), 1704067200000 + i * 1000, None, i) for i in range(start, start + n)]
    return spark.createDataFrame(rows, RAW_EVENT_SCHEMA)


def test_snapshot_time_travel(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(prepare_events(_batch(spark, 0, 10)))
    t.append(prepare_events(_batch(spark, 10, 5), ))
    assert t.read().count() == 15
    assert t.read(version=0).count() == 10  # as-of first snapshot
    assert t.read(version=1).count() == 15
    # partition columns still materialize from the dir layout
    assert t.read(version=0).where(F.col("event_date").isNull()).count() == 0
    with pytest.raises(ValueError):
        t.read(version=7)


def test_time_travel_across_compaction(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    for s in range(3):
        t.append(prepare_events(_batch(spark, s * 5, 5)))
    pre_compact_rows = t.read(version=1).count()
    t.compact(min_input_files=2)
    # post-compaction snapshot sees all data AND old snapshots stay
    # readable: compaction commits a manifest delta (inputs removed, new
    # files added) and leaves the input files on disk for time travel
    # until expire_snapshots releases them
    assert t.read().count() == 15
    assert pre_compact_rows == 10
    assert t.read(version=1).count() == 10  # time travel ACROSS compaction
    latest = len(t.snapshots()) - 1
    assert t.read(version=latest).count() == 15
    # expiration releases the pre-compact snapshots; orphan sweep then
    # reclaims the compacted-away inputs, and the latest read still serves
    expired = t.expire_snapshots(keep_last=1)
    assert expired == [0, 1, 2]
    removed = t.remove_orphans(older_than_s=0)
    assert len(removed) > 0
    assert t.read().count() == 15


def test_incremental_read_changes(spark, tmp_path):
    """read_changes((from, to]) delivers appended rows exactly once —
    including across a compaction that rewrites them into new files."""
    t = EventTable(spark, str(tmp_path), "events")
    for s in range(3):
        t.append(prepare_events(_batch(spark, s * 5, 5)))  # versions 0,1,2
    # full history and suffix windows
    assert t.read_changes(None).count() == 15
    assert t.read_changes(0).count() == 10  # versions 1..2
    assert t.read_changes(1, 2).count() == 5
    assert t.read_changes(2).count() == 0  # nothing after latest
    # appended-row identity, not just counts (payloads are unique per batch)
    payloads = sorted(bytes(r.payload).decode() for r in t.read_changes(0).collect())
    assert payloads == sorted(f"p{i}" for i in range(5, 15))

    t.compact(min_input_files=2)  # version 3 (rewrite, no new data)
    t.append(prepare_events(_batch(spark, 15, 4)))  # version 4
    # compaction contributes nothing; the pre-compact append files remain
    # readable (physical delete deferred), so the incremental consumer
    # that checkpointed at version 1 still gets versions 2+4 exactly once
    assert t.read_changes(2).count() == 4
    assert t.read_changes(1).count() == 9
    assert t.read_changes(None).count() == 19
    with pytest.raises(ValueError):
        t.read_changes(0, 99)


def test_sql_view_surface(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "sql-events")
    t.append(prepare_events(_batch(spark, 0, 12)))
    view = t.create_view()
    got = spark.sql(
        f"SELECT partition, max(sequence) AS hwm FROM {view} GROUP BY partition"
    ).collect()
    assert got[0].hwm == 12


def test_max_files_per_trigger_rate_limit(spark, tmp_path):
    """T3/T10: maxFilesPerTrigger bounds per-batch work; each file becomes
    its own micro-batch + snapshot."""
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for b in range(3):
        with open(os.path.join(landing, f"b{b}.json"), "w") as fh:
            for i in range(4):
                fh.write(
                    json.dumps(
                        {
                            "topic": "t",
                            "partition": 0,
                            "payload": f"p{b}-{i}",
                            "timestamp_ms": 1704067200000 + (b * 4 + i) * 1000,
                            "idempotency_key": None,
                            "ingest_order": b * 4 + i,
                        }
                    )
                    + "\n"
                )
    table = EventTable(spark, str(tmp_path), "rate-events")
    ing = StreamingIngest(spark, landing, table, str(tmp_path / "ckpt"))
    # patch the source with a maxFilesPerTrigger rate limit
    orig = StreamingIngest._raw_stream

    def _limited_stream(self):
        json_schema = (
            "topic string, partition int, payload string, timestamp_ms long, "
            "idempotency_key string, ingest_order long"
        )
        r = (
            self.spark.readStream.schema(json_schema)
            .option("maxFilesPerTrigger", 1)
            .json(self.landing_dir)
        )
        return r.select(
            "topic",
            "partition",
            F.col("payload").cast("binary").alias("payload"),
            "timestamp_ms",
            "idempotency_key",
            "ingest_order",
        )

    StreamingIngest._raw_stream = _limited_stream
    try:
        q = ing.start(available_now=True)
        q.awaitTermination(120)
    finally:
        StreamingIngest._raw_stream = orig
    assert table.read().count() == 12
    snaps = [s for s in table.snapshots() if s["operation"] == "append"]
    assert len(snaps) == 3  # one snapshot per rate-limited micro-batch
    # sequences remain gapless across the 3 batches
    seqs = sorted(r.sequence for r in table.read().collect())
    assert seqs == list(range(1, 13))
