"""Streaming ingest tests: T1/T2/T5/T7/T11 semantics + crash-recovery
analogue (checkpoint restart without duplicate flush — reference
tests/crash_recovery_tests.rs:998-1078)."""

import json
import os

import pyspark.sql.functions as F

from zombi_spark.streaming.ingest import StreamingIngest
from zombi_spark.table.event_table import EventTable


def _drop_files(landing, name, events):
    os.makedirs(landing, exist_ok=True)
    with open(os.path.join(landing, f"{name}.json"), "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")


def _mk_events(start, n, topic="t1", partitions=2, key=None):
    return [
        {
            "topic": topic,
            "partition": i % partitions,
            "payload": f"p-{i}",
            "timestamp_ms": 1700000000000 + i * 60000,
            "idempotency_key": (f"{key}{i}" if key else None),
            "ingest_order": i,
        }
        for i in range(start, start + n)
    ]


def test_streaming_drain_and_resume(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table = EventTable(spark, str(tmp_path), "stream-events")
    ckpt = str(tmp_path / "ckpt")
    ing = StreamingIngest(spark, landing, table, ckpt)

    # batch 1: drain landing zone (T11 availableNow)
    _drop_files(landing, "b1", _mk_events(0, 20))
    q = ing.start(available_now=True)
    q.awaitTermination(120)
    assert table.read().count() == 20
    hwm1 = {(r.topic, r.partition): r.high_watermark for r in table.high_watermarks().collect()}
    assert hwm1[("t1", 0)] == 10 and hwm1[("t1", 1)] == 10

    # batch 2 after 'restart': new query instance, same checkpoint —
    # already-processed file NOT re-flushed (T7), sequences continue (INV-1)
    _drop_files(landing, "b2", _mk_events(20, 10))
    ing2 = StreamingIngest(spark, landing, table, ckpt)
    q2 = ing2.start(available_now=True)
    q2.awaitTermination(120)
    assert table.read().count() == 30
    hwm2 = {(r.topic, r.partition): r.high_watermark for r in table.high_watermarks().collect()}
    assert hwm2[("t1", 0)] == 15 and hwm2[("t1", 1)] == 15
    # gapless per partition
    for p in (0, 1):
        seqs = sorted(
            r.sequence for r in table.read().where(F.col("partition") == p).collect()
        )
        assert seqs == list(range(1, 16))
    # one snapshot per non-empty micro-batch (T5)
    assert len([s for s in table.snapshots() if s["operation"] == "append"]) == 2


def test_streaming_backpressure_max_files_per_trigger(spark, tmp_path):
    """T10 admission control: a 100-file dump with maxFilesPerTrigger=25
    drains as ≥4 bounded micro-batches (one append snapshot each), not one
    unbounded batch — the streaming analogue of the reference edge's
    permit/byte semaphore (handlers.rs:64-232)."""
    landing = str(tmp_path / "landing")
    table = EventTable(spark, str(tmp_path), "stream-bp")
    ing = StreamingIngest(
        spark,
        landing,
        table,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=25,
    )
    for i in range(100):
        _drop_files(landing, f"f{i:03d}", _mk_events(i * 2, 2))
    q = ing.start(available_now=True)
    q.awaitTermination(300)
    assert table.read().count() == 200
    appends = [s for s in table.snapshots() if s["operation"] == "append"]
    assert len(appends) >= 4  # 100 files / 25 per trigger
    # sequences still gapless across the batch boundaries (INV-1)
    for p in (0, 1):
        seqs = sorted(
            r.sequence for r in table.read().where(F.col("partition") == p).collect()
        )
        assert seqs == list(range(1, 101))


def test_hot_cold_tail_read(spark, tmp_path):
    """Hot-tier mitigation (SPEC L1 analogue): a tail read sees committed
    rows (cold parquet) AND not-yet-ingested landing files (hot), each
    event exactly once; after draining, the same events come from cold
    only — no duplicates across the tier boundary."""
    landing = str(tmp_path / "landing")
    table = EventTable(spark, str(tmp_path), "stream-hot")
    ing = StreamingIngest(spark, landing, table, str(tmp_path / "ckpt"))

    _drop_files(landing, "b1", _mk_events(0, 10, partitions=1))
    q = ing.start(available_now=True)
    q.awaitTermination(120)

    # 6 more events land but are NOT ingested yet
    _drop_files(landing, "b2", _mk_events(10, 6, partitions=1))

    tail = ing.tail("t1", partition=0, limit=100).collect()
    assert len(tail) == 16  # 10 committed + 6 hot, no double count
    hot = [r for r in tail if not r.committed]
    cold = [r for r in tail if r.committed]
    assert len(hot) == 6 and len(cold) == 10
    assert all(r.sequence is None for r in hot)
    # newest-first ordering across tiers
    ts = [r.timestamp_ms for r in tail]
    assert ts == sorted(ts, reverse=True)
    assert tail[0].committed is False  # freshest events are the hot ones

    # since_ms bound respected across both tiers
    since = 1700000000000 + 12 * 60000
    recent = ing.tail("t1", partition=0, since_ms=since, limit=100).collect()
    assert len(recent) == 4 and all(r.timestamp_ms >= since for r in recent)

    # drain: the 6 hot events commit; tail now serves them from cold only
    q2 = ing.start(available_now=True)
    q2.awaitTermination(120)
    tail2 = ing.tail("t1", partition=0, limit=100).collect()
    assert len(tail2) == 16
    assert all(r.committed for r in tail2)


def test_tail_partition_filter_sees_idle_partition(spark, tmp_path):
    """A partition-filtered tail must return the TRUE newest rows for
    that partition even when it has been idle — the newest global files
    may not contain it, so latest-n planning must not apply."""
    landing = str(tmp_path / "landing")
    table = EventTable(spark, str(tmp_path), "stream-idle")
    ing = StreamingIngest(spark, landing, table, str(tmp_path / "ckpt"))

    # partition 1 writes early, then goes idle; partition 0 floods later
    early = [
        {"topic": "t1", "partition": 1, "payload": f"e-{i}",
         "timestamp_ms": 1700000000000 + i, "idempotency_key": None,
         "ingest_order": i}
        for i in range(5)
    ]
    flood = [
        {"topic": "t1", "partition": 0, "payload": f"f-{i}",
         "timestamp_ms": 1700009000000 + i, "idempotency_key": None,
         "ingest_order": 100 + i}
        for i in range(50)
    ]
    _drop_files(landing, "b1", early)
    q = ing.start(available_now=True)
    q.awaitTermination(120)
    _drop_files(landing, "b2", flood)
    q2 = ing.start(available_now=True)
    q2.awaitTermination(120)

    got = ing.tail("t1", partition=1, limit=10).collect()
    assert len(got) == 5  # all of the idle partition's rows, not zero
    assert all(r.partition == 1 for r in got)


def test_tail_topic_filter_sees_idle_topic(spark, tmp_path):
    """A topic-filtered tail must return the TRUE newest rows for that
    topic even when it has been idle: the globally-newest files may not
    contain it, so latest-n planning must be topic-aware (per-file topic
    bounds), not a post-hoc filter over a global latest-n plan."""
    landing = str(tmp_path / "landing")
    table = EventTable(spark, str(tmp_path), "stream-topics")
    ing = StreamingIngest(spark, landing, table, str(tmp_path / "ckpt"))

    # topic 'quiet' writes early, then goes idle; 'busy' floods later
    early = [
        {"topic": "quiet", "partition": 0, "payload": f"e-{i}",
         "timestamp_ms": 1700000000000 + i, "idempotency_key": None,
         "ingest_order": i}
        for i in range(5)
    ]
    flood = [
        {"topic": "busy", "partition": 0, "payload": f"f-{i}",
         "timestamp_ms": 1700009000000 + i, "idempotency_key": None,
         "ingest_order": 100 + i}
        for i in range(50)
    ]
    _drop_files(landing, "b1", early)
    q = ing.start(available_now=True)
    q.awaitTermination(120)
    _drop_files(landing, "b2", flood)
    q2 = ing.start(available_now=True)
    q2.awaitTermination(120)

    got = ing.tail("quiet", limit=10).collect()
    assert len(got) == 5  # all of the idle topic's rows, not zero
    assert all(r.topic == "quiet" for r in got)

    # and the plan is topic-PRUNED, not a full-manifest fallback: the
    # flood batch's files are single-topic 'busy' and must be skipped
    planned = table.plan_latest_files(10, topic="quiet")
    assert planned, "expected a non-empty plan for the idle topic"
    assert all(e.get("max_topic") == "quiet" for e in planned)
    n_all = len(table.scan_files())
    assert len(planned) < n_all


def test_streaming_idempotency_across_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table = EventTable(spark, str(tmp_path), "stream-idem")
    ing = StreamingIngest(spark, landing, table, str(tmp_path / "ckpt"))

    _drop_files(landing, "b1", _mk_events(0, 8, partitions=1, key="k"))
    q = ing.start(available_now=True)
    q.awaitTermination(120)
    # replay the same idempotency keys in a new file (client retry, INV-4)
    _drop_files(landing, "b2", _mk_events(0, 8, partitions=1, key="k"))
    q2 = ing.start(available_now=True)
    q2.awaitTermination(120)
    assert table.read().count() == 8  # replays suppressed
    assert table.read().select(F.max("sequence")).collect()[0][0] == 8


def test_admission_control_bounds_landing_zone(spark, tmp_path):
    """T10 admission control (handlers.rs:64-232 semantics): a burst
    beyond the landing byte budget is REFUSED (AdmissionRejected = the
    503), the refusal surfaces in health(), and draining the backlog
    restores admission."""
    import pytest

    from zombi_spark.streaming.ingest import AdmissionRejected
    from zombi_spark.table.stats import health

    landing = str(tmp_path / "landing")
    table = EventTable(spark, str(tmp_path), "stream-admit")
    ing = StreamingIngest(
        spark, landing, table, str(tmp_path / "ckpt"), landing_byte_budget=4096
    )

    # accepted produce lands an atomic file
    ing.produce("b0", _mk_events(0, 5, partitions=1))
    assert health(table, ingest=ing)["admission"]["status"] == 200

    # burst past the budget: eventually refused, zone stays bounded
    with pytest.raises(AdmissionRejected):
        for i in range(1, 100):
            ing.produce(f"b{i}", _mk_events(i * 5, 5, partitions=1))
    h = health(table, ingest=ing)
    assert h["admission"]["status"] == 503 and not h["admission"]["accepting"]
    assert h["live"]  # over-budget edge is not dead — reads/drain still work
    # bounded by budget + one in-flight batch (semaphore semantics)
    assert ing.backlog_bytes() <= 4096 + 1024

    # drain → backlog clears → admission restored; nothing was lost or
    # half-written (every admitted file ingested exactly once)
    q = ing.start(available_now=True)
    q.awaitTermination(300)
    h2 = health(table, ingest=ing)
    assert h2["ready"]  # table exists and resolves once data committed
    assert h2["admission"]["status"] == 200 and h2["admission"]["backlog_bytes"] == 0
    n_admitted = sum(
        1 for f in __import__("os").listdir(landing) if f.endswith(".json")
    )
    assert table.read().count() == n_admitted * 5
    ing.produce("after-drain", _mk_events(1000, 5, partitions=1))


def test_null_system_columns_cannot_poison_watermarks(spark, tmp_path):
    """Round-6 review fix: a landing line missing topic/partition (a
    library producer, or a malformed line PERMISSIVE-parsed to nulls)
    used to commit the unparseable summary key
    'zombi.watermark.None/None', after which every watermark_map() read
    — i.e. all future ingest — raised. The streaming reader now defaults
    the system columns (table name / partition 0), and a direct append
    with null system columns refuses BEFORE committing anything."""
    import pytest

    table = EventTable(spark, str(tmp_path), "poison")
    ing = StreamingIngest(spark, str(tmp_path / "landing"), table, str(tmp_path / "ckpt"))
    # library producer omits topic and partition entirely
    ing.produce("bare", [{"payload": "p1"}, {"payload": "p2"}])
    q = ing.start(available_now=True)
    q.awaitTermination(300)
    assert table.read().count() == 2
    wm = table.watermark_map()  # must parse — this is what used to raise
    assert wm[("poison", 0)] == 2
    got = {(r["topic"], r["partition"]) for r in table.read().select("topic", "partition").collect()}
    assert got == {("poison", 0)}

    # the direct-append path refuses nulls before any commit
    from zombi_spark.ingest.batch import prepare_events

    version_before = table.latest_version()
    bad = spark.createDataFrame(
        [(None, None, b"x", 1704067200000, None, 1)],
        "topic string, partition int, payload binary, timestamp_ms long, "
        "idempotency_key string, ingest_order long",
    )
    with pytest.raises(ValueError, match="NULL topic/partition"):
        table.append(prepare_events(bad))
    assert table.latest_version() == version_before  # nothing committed
