"""M6 observability: /stats rollup, health, Prometheus exposition
(handlers.rs:1414-1523, 1035-1041, 1532-1691) — all O(metadata)."""

import json
import os

from zombi_spark.ingest.batch import RAW_EVENT_SCHEMA, prepare_events
from zombi_spark.table.event_table import EventTable
from zombi_spark.table.stats import (
    health,
    ingest_metrics,
    pending_stats,
    prometheus_text,
    table_stats,
)


def _batch(spark, start, n):
    rows = [
        ("t", i % 2, f"p{i}".encode(), 1704067200000 + i * 1000, None, i)
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(rows, RAW_EVENT_SCHEMA)


def test_table_stats_rollup(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(prepare_events(_batch(spark, 0, 10)))
    t.append(prepare_events(_batch(spark, 10, 6), existing=t.read()))
    t.compact(min_input_files=1)

    s = table_stats(t)
    assert s["table"] == "events"
    assert s["current_version"] == 2
    assert s["snapshot_count"] == 3
    assert s["operations"] == {"append": 2, "compact": 1}
    assert s["total_rows"] == 16
    assert s["file_count"] > 0 and s["total_bytes"] > 0
    assert s["partition_count"] == 2  # producer partitions 0 and 1
    assert s["watermarks"]["zombi.watermark.t/0"] == 8
    # freshness: commits happen "now" (2026), events are dated 2024-01-01 →
    # a large positive committed-vs-arrived lag
    assert s["freshness_lag_ms"] > 0
    assert s["max_event_timestamp_ms"] == 1704067200000 + 15 * 1000
    assert s["ingest_rows_per_sec"] is not None  # two appends → a rate


def test_ingest_metrics_rollup(spark, tmp_path):
    """M6-lite ingest metrics: per-batch commit-latency percentiles + rate
    from snapshot summaries alone (metrics/registry.rs histogram analogue;
    percentile_approx is the fleet-scale aggregate)."""
    t = EventTable(spark, str(tmp_path), "events")
    for s in range(3):
        t.append(prepare_events(_batch(spark, s * 5, 5)))
    m = ingest_metrics(t)
    assert m["append_batches"] == 3 and m["batches_with_latency"] == 3
    assert m["total_rows"] == 15
    assert 0 < m["latency_ms_p50"] <= m["latency_ms_p90"] <= m["latency_ms_p99"]
    assert m["latency_ms_max"] >= m["latency_ms_p99"]
    assert m["rows_per_sec_p50_batch"] > 0
    # the latency gauges reach the Prometheus exposition
    text = prometheus_text([t])
    assert 'zombi_append_latency_ms{table="events",quantile="p99"}' in text


def test_stats_empty_table(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    s = table_stats(t)
    assert s["snapshot_count"] == 0 and s["total_rows"] == 0
    assert s["current_version"] is None and s["freshness_lag_ms"] is None


def test_pending_stats(spark, tmp_path):
    """A5: staged + moved-but-uncommitted parquet shows up as pending;
    a clean committed table reports zero."""
    t = EventTable(spark, str(tmp_path), "events")
    t.append(prepare_events(_batch(spark, 0, 10)))
    assert pending_stats(t)["pending_files"] == 0

    # simulate a crashed append: a staging tree with one parquet...
    stage = os.path.join(t.path, ".append-deadbeef", "event_date=2024-01-01", "event_hour=0")
    os.makedirs(stage)
    committed = t.files()[0]["file_path"]
    with open(committed, "rb") as src, open(os.path.join(stage, "part-0.parquet"), "wb") as dst:
        dst.write(src.read())
    # ...and a moved-but-uncommitted data file
    orphan = os.path.join(os.path.dirname(committed), "orphan.parquet")
    with open(committed, "rb") as src, open(orphan, "wb") as dst:
        dst.write(src.read())

    s = pending_stats(t)
    assert s["pending_files"] == 2
    assert s["staging_files"] == 1
    assert s["uncommitted_data_files"] == 1
    assert s["pending_bytes"] > 0
    assert sum(p["files"] for p in s["per_partition"].values()) == 2

    # the orphan sweep reclaims exactly that pending set
    t.remove_orphans(older_than_s=0)
    assert pending_stats(t)["pending_files"] == 0


def test_health_ready_and_corrupt_metadata(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(prepare_events(_batch(spark, 0, 5)))
    h = health(t)
    assert h == {"live": True, "ready": True, "detail": "ok"}

    # corrupt the snapshot log → live but not ready
    snap_path = os.path.join(t.meta_path, "snap-00000000.json")
    with open(snap_path, "w") as fh:
        fh.write("{not json")
    t2 = EventTable(spark, str(tmp_path), "events")  # fresh cache
    h2 = health(t2)
    assert h2["live"] and not h2["ready"]
    assert "metadata error" in h2["detail"]


def test_prometheus_exposition(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    snap = t.append(prepare_events(_batch(spark, 0, 10)))
    text = prometheus_text([t], now_ms=snap["committed_at_ms"] + 5000)
    assert '# TYPE zombi_table_rows gauge' in text
    assert 'zombi_table_rows{table="events"} 10' in text
    assert 'zombi_high_watermark{table="events",topic="t",partition="0"} 5' in text
    assert 'zombi_commit_age_ms{table="events"} 5000' in text
    # every non-comment line is "name{labels} value" — parseable exposition
    for line in text.strip().splitlines():
        if not line.startswith("#"):
            name_labels, value = line.rsplit(" ", 1)
            float(value)
            assert "{" in name_labels and name_labels.endswith("}")


def test_prometheus_admission_gauges(spark, tmp_path):
    """T10 admission state exported in the /metrics exposition."""
    from zombi_spark.streaming.ingest import StreamingIngest
    from zombi_spark.table.stats import prometheus_ingest_text

    table = EventTable(spark, str(tmp_path), "metered")
    ing = StreamingIngest(
        spark, str(tmp_path / "landing"), table, str(tmp_path / "ckpt"),
        landing_byte_budget=256,
    )
    text = prometheus_ingest_text([ing])
    assert 'zombi_landing_backlog_bytes{table="metered"} 0' in text
    assert 'zombi_landing_budget_bytes{table="metered"} 256' in text
    assert 'zombi_landing_accepting{table="metered"} 1' in text
    # push past the budget: backlog shows, accepting flips to 0
    ing.produce("b0", [
        {"topic": "metered", "partition": 0, "payload": "x" * 300,
         "timestamp_ms": 1, "idempotency_key": None, "ingest_order": 0}
    ])
    text = prometheus_ingest_text([ing])
    assert 'zombi_landing_accepting{table="metered"} 0' in text
