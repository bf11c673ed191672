"""Incremental materialized rollup (table/rollup.py): delta-only
refreshes, exact agreement with a full recompute, and crash-safe
atomic (state, position) commits."""

import json
import os

from pyspark.sql import functions as F

from zombi_spark.ingest.batch import RAW_EVENT_SCHEMA, prepare_events
from zombi_spark.table.event_table import EventTable
from zombi_spark.table.rollup import MaterializedRollup


def _batch(spark, start, n, topic="t", hour_spread_ms=0):
    rows = [
        (topic, i % 2, f"p{start + i}".encode(),
         1704067200000 + (start + i) * (hour_spread_ms or 1000), None, start + i)
        for i in range(n)
    ]
    return prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA))


def _expected(table, keys):
    return (
        table.read()
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("payload_bytes"),
            F.min("timestamp_ms").alias("min_ts"),
            F.max("timestamp_ms").alias("max_ts"),
            F.max("sequence").alias("max_seq"),
        )
    )


def _same(a, b, keys):
    ka = sorted(tuple(r) for r in a.collect())
    kb = sorted(tuple(r) for r in b.collect())
    return ka == kb


KEYS = ("topic", "partition", "event_date", "event_hour")


def test_refresh_matches_full_recompute_and_is_incremental(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    roll = MaterializedRollup(t, str(tmp_path / "rollup"))
    assert roll.read().count() == 0  # empty state, real schema

    t.append(_batch(spark, 0, 40, hour_spread_ms=120_000))  # spans hours
    rep = roll.refresh()
    assert rep["to_version"] == t.latest_version() and rep["delta_rows"] == 40
    assert _same(roll.read(), _expected(t, KEYS), KEYS)

    # second append: the refresh consumes ONLY the delta
    t.append(_batch(spark, 40, 25, hour_spread_ms=120_000))
    rep2 = roll.refresh()
    assert rep2["delta_rows"] == 25  # not 65 — delta, not a rescan
    assert rep2["from_version"] == rep["to_version"]
    assert _same(roll.read(), _expected(t, KEYS), KEYS)

    # nothing new → no-op report, state untouched
    rep3 = roll.refresh()
    assert rep3["to_version"] is None and rep3["delta_rows"] == 0
    assert _same(roll.read(), _expected(t, KEYS), KEYS)


def test_crash_between_state_write_and_pointer_is_exactly_once(spark, tmp_path):
    """The pointer swing is the only visibility point: a stale state dir
    written by a crashed refresh must not double-count when the retry
    runs, and the old (state, position) pair keeps serving meanwhile."""
    t = EventTable(spark, str(tmp_path), "events")
    roll = MaterializedRollup(t, str(tmp_path / "rollup"))
    t.append(_batch(spark, 0, 10))
    roll.refresh()
    before = sorted(tuple(r) for r in roll.read().collect())
    ptr_before = json.load(open(tmp_path / "rollup" / "ROLLUP.json"))

    # simulate the crash: new data lands, a refresh computes and writes
    # its state dir, then dies BEFORE the pointer swing
    t.append(_batch(spark, 10, 10))
    delta = t.read_changes(ptr_before["version"], t.latest_version())
    orphan = tmp_path / "rollup" / "state-crashed00000"
    roll._merge(roll.read(), roll._agg(delta)).write.parquet(str(orphan))
    # pointer unchanged → reads still serve the old consistent state
    assert sorted(tuple(r) for r in roll.read().collect()) == before

    # the retry (a fresh instance, as after a process restart) refreshes
    # from the OLD position and lands exactly-once
    roll2 = MaterializedRollup(t, str(tmp_path / "rollup"))
    rep = roll2.refresh()
    assert rep["delta_rows"] == 10
    assert _same(roll2.read(), _expected(t, KEYS), KEYS)
    total = roll2.read().agg(F.sum("n_events")).first()[0]
    assert total == 20  # no double count despite the orphan state dir


def test_survives_restart_and_custom_keys(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(_batch(spark, 0, 12))
    path = str(tmp_path / "rollup")
    MaterializedRollup(t, path, keys=("topic",)).refresh()
    # a new instance (new process) sees the committed position and state
    roll = MaterializedRollup(t, path, keys=("topic",))
    assert roll.position == t.latest_version()
    row = roll.read().collect()[0]
    assert row.topic == "t" and row.n_events == 12 and row.max_seq == 6


def test_rollup_on_extraction_table_without_payload(spark, tmp_path):
    """Extraction tables drop the raw payload column at write — the
    rollup must carry zero bytes, not an unresolved-column failure."""
    from zombi_spark.ingest.extraction import FieldSpec, TableSchemaConfig

    cfg = TableSchemaConfig(
        payload_format="json",
        fields=[FieldSpec(name="v", json_path="v", data_type="int64")],
    )
    t = EventTable(spark, str(tmp_path), "events", schema_config=cfg)
    rows = [("t", 0, json.dumps({"v": i}).encode(), 1704067200000 + i, None, i) for i in range(6)]
    t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    assert "payload" not in t.read().columns  # the precondition
    roll = MaterializedRollup(t, str(tmp_path / "rollup"))
    rep = roll.refresh()
    assert rep["delta_rows"] == 6
    row = roll.read().collect()[0]
    assert row.n_events == 6 and row.payload_bytes == 0


def test_refresh_gc_reclaims_orphan_state_dirs(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(_batch(spark, 0, 5))
    roll = MaterializedRollup(t, str(tmp_path / "rollup"))
    roll.refresh()
    first_state = json.load(open(tmp_path / "rollup" / "ROLLUP.json"))["state_dir"]
    # a crashed refresh's orphan + a new append + a successful refresh
    os.makedirs(tmp_path / "rollup" / "state-orphan000000")
    t.append(_batch(spark, 5, 5))
    roll.refresh()
    dirs = {d for d in os.listdir(tmp_path / "rollup") if d.startswith("state-")}
    assert "state-orphan000000" not in dirs  # orphan reclaimed
    assert first_state in dirs  # one generation of grace for readers
    assert len(dirs) == 2


def test_streaming_maintains_rollup_continuously(spark, tmp_path):
    """maintain_rollup=True: every micro-batch folds itself into the
    rollup right after its snapshot commits — a continuous aggregate
    with no explicit refresh calls."""
    from zombi_spark.streaming.ingest import StreamingIngest

    ing = StreamingIngest(
        spark,
        str(tmp_path / "landing"),
        EventTable(spark, str(tmp_path), "cont"),
        str(tmp_path / "ckpt"),
        maintain_rollup=True,
    )
    ing.produce("b1", [
        {"topic": "cont", "partition": 0, "payload": f"p{i}",
         "timestamp_ms": 1704067200000 + i, "idempotency_key": None, "ingest_order": i}
        for i in range(8)
    ])
    q = ing.start(available_now=True)
    q.awaitTermination(300)
    assert ing.rollup.position == ing.table.latest_version()
    assert ing.rollup.read().agg(F.sum("n_events")).first()[0] == 8
    # a second batch through the stream keeps it current
    ing.produce("b2", [
        {"topic": "cont", "partition": 1, "payload": "x",
         "timestamp_ms": 1704067300000, "idempotency_key": None, "ingest_order": 99}
    ])
    q = ing.start(available_now=True)
    q.awaitTermination(300)
    assert ing.rollup.position == ing.table.latest_version()
    assert ing.rollup.read().agg(F.sum("n_events")).first()[0] == 9


def test_retention_delete_triggers_full_rebuild(spark, tmp_path):
    """A row-removing snapshot (retention delete) can't be folded
    additively — the next refresh must detect it and rebuild from the
    live table, keeping merged == full recompute. Compaction stays on
    the cheap additive path (row-preserving)."""
    t = EventTable(spark, str(tmp_path), "events")
    day = 24 * 3600 * 1000
    old_rows = [("t", 0, b"x", 1704067200000 + i, None, i) for i in range(6)]
    new_rows = [("t", 0, b"y", 1704067200000 + 30 * day + i, None, 6 + i) for i in range(4)]
    t.append(prepare_events(spark.createDataFrame(old_rows, RAW_EVENT_SCHEMA)))
    t.append(prepare_events(spark.createDataFrame(new_rows, RAW_EVENT_SCHEMA)))
    roll = MaterializedRollup(t, str(tmp_path / "rollup"))
    roll.refresh()
    assert roll.read().agg(F.sum("n_events")).first()[0] == 10

    rep = t.expire_data_older_than(1704067200000 + 15 * day)
    assert rep["rows_removed"] == 6
    rep2 = roll.refresh()
    assert rep2["rebuilt"] is True
    assert roll.read().agg(F.sum("n_events")).first()[0] == 4  # not 10
    assert _same(roll.read(), _expected(t, KEYS), KEYS)

    # compaction does NOT force a rebuild: append more, compact, refresh
    t.append(prepare_events(spark.createDataFrame(
        [("t", 0, b"z", 1704067200000 + 30 * day + 100 + i, None, 10 + i) for i in range(3)],
        RAW_EVENT_SCHEMA)))
    t.compact(min_input_files=2)
    rep3 = roll.refresh()
    assert rep3["rebuilt"] is False
    assert _same(roll.read(), _expected(t, KEYS), KEYS)


def test_sharded_state_rewrites_only_touched_shards(spark, tmp_path):
    """High-cardinality contract: past the shard threshold the state is
    hash-partitioned by key and a refresh rewrites ONLY the shards its
    delta touches — every untouched shard's files carry over by hardlink
    (same inode), so write cost tracks keys touched, not keys
    accumulated. Reads and the full-recompute invariant are unchanged
    across the sharded layout."""
    t = EventTable(spark, str(tmp_path), "events")
    # threshold 0 with a recorded state → second refresh transitions to
    # the sharded layout; high key cardinality via per-event hours
    roll = MaterializedRollup(
        t, str(tmp_path / "rollup"), n_shards=8, shard_threshold_rows=0
    )
    t.append(_batch(spark, 0, 60, hour_spread_ms=3_600_000))  # 60 distinct hours
    r1 = roll.refresh()
    assert r1["state_rows"] == roll.read().count()

    t.append(_batch(spark, 60, 20, hour_spread_ms=3_600_000))
    r2 = roll.refresh()  # transition: full write, now sharded
    state_dir2 = os.path.join(str(tmp_path / "rollup"), roll._pointer()["state_dir"])
    assert roll._pointer()["n_shards"] == 8
    assert any(d.startswith("_shard=") for d in os.listdir(state_dir2))
    assert _same(roll.read(), _expected(t, KEYS), KEYS)

    # record inode per shard dir, then touch ONE key (one event into an
    # existing hour) and refresh
    def shard_inodes(d):
        out = {}
        for sh in os.listdir(d):
            if sh.startswith("_shard="):
                files = sorted(
                    f for f in os.listdir(os.path.join(d, sh)) if not f.startswith((".", "_"))
                )
                out[sh] = [os.stat(os.path.join(d, sh, f)).st_ino for f in files]
        return out
    before = shard_inodes(state_dir2)
    t.append(_batch(spark, 0, 1, hour_spread_ms=3_600_000))  # key of event 0 again
    r3 = roll.refresh()
    assert r3["delta_rows"] == 1
    state_dir3 = os.path.join(str(tmp_path / "rollup"), roll._pointer()["state_dir"])
    after = shard_inodes(state_dir3)
    assert set(after) == set(before)  # all 8 populated shards present
    rewritten = [sh for sh in after if after[sh] != before.get(sh)]
    assert len(rewritten) == 1, f"expected exactly one rewritten shard, got {rewritten}"
    carried = [sh for sh in after if after[sh] == before.get(sh)]
    assert len(carried) == len(after) - 1  # hardlinked, not copied
    # state_rows accounting without a full-state count stays exact
    assert r3["state_rows"] == roll.read().count()
    assert _same(roll.read(), _expected(t, KEYS), KEYS)
    # read() hides the internal _shard column
    assert "_shard" not in roll.read().columns


def test_sharded_crash_between_state_write_and_pointer_is_exactly_once(spark, tmp_path):
    """The sharded write path keeps the crash contract: a refresh that
    wrote its touched shards AND hardlinked the untouched ones but died
    before the pointer swing leaves the old (state, position) serving;
    the retry recomputes the same delta exactly once, and GC reclaims
    the orphan generation without harming the hardlink-shared bytes."""
    t = EventTable(spark, str(tmp_path), "events")
    roll = MaterializedRollup(
        t, str(tmp_path / "rollup"), n_shards=8, shard_threshold_rows=0
    )
    t.append(_batch(spark, 0, 60, hour_spread_ms=3_600_000))
    roll.refresh()
    t.append(_batch(spark, 60, 10, hour_spread_ms=3_600_000))
    roll.refresh()  # now sharded
    assert roll._pointer().get("n_shards") == 8
    before = sorted(tuple(r) for r in roll.read().collect())
    ptr_before = dict(roll._pointer())

    # crash simulation: delta lands, the would-be refresh writes a full
    # orphan generation (touched shard + hardlinks), pointer NOT swung
    t.append(_batch(spark, 0, 1, hour_spread_ms=3_600_000))
    old_dir = os.path.join(str(tmp_path / "rollup"), ptr_before["state_dir"])
    orphan = os.path.join(str(tmp_path / "rollup"), "state-crashed0000")
    delta = t.read_changes(ptr_before["version"], t.latest_version())
    partial = roll._agg(delta)
    shard = roll._shard_col(8)
    (
        roll._merge(roll.read(), partial)
        .withColumn("_shard", shard)
        .write.partitionBy("_shard")
        .parquet(orphan)
    )
    assert sorted(tuple(r) for r in roll.read().collect()) == before

    # retry from a fresh instance: exactly-once, still sharded, orphan GC'd
    roll2 = MaterializedRollup(
        t, str(tmp_path / "rollup"), n_shards=8, shard_threshold_rows=0
    )
    rep = roll2.refresh()
    assert rep["delta_rows"] == 1
    assert _same(roll2.read(), _expected(t, KEYS), KEYS)
    total = roll2.read().agg(F.sum("n_events")).first()[0]
    assert total == 71  # 60 + 10 + 1, no double count
    dirs = [d for d in os.listdir(str(tmp_path / "rollup")) if d.startswith("state-")]
    assert "state-crashed0000" not in dirs  # orphan generation reclaimed
    # hardlink sharing survived the GC: current state still fully readable
    assert roll2.read().count() == rep["state_rows"]


def test_retention_emptying_a_sharded_rollup_recovers(spark, tmp_path):
    """Regression (round-6 review): a retention delete that removes the
    ENTIRE key range of a SHARDED rollup rebuilds to an empty state —
    the empty state must write unsharded (a zero-row partitionBy write
    emits no schema-bearing files and the read-back would raise), and
    the rollup must keep advancing afterwards."""
    t = EventTable(spark, str(tmp_path), "events")
    day = 24 * 3600 * 1000
    roll = MaterializedRollup(
        t, str(tmp_path / "rollup"), n_shards=8, shard_threshold_rows=0
    )
    t.append(_batch(spark, 0, 30, hour_spread_ms=3_600_000))
    roll.refresh()
    t.append(_batch(spark, 30, 10, hour_spread_ms=3_600_000))
    roll.refresh()
    assert roll._pointer().get("n_shards") == 8  # sharded now

    rep = t.expire_data_older_than(1704067200000 + 400 * day)  # drop everything
    assert rep["rows_removed"] == 40
    rep2 = roll.refresh()
    assert rep2["rebuilt"] is True and rep2["state_rows"] == 0
    assert roll.read().count() == 0  # readable empty state

    # life goes on: new data folds, re-sharding happens on the next step
    t.append(_batch(spark, 100, 5, hour_spread_ms=3_600_000))
    rep3 = roll.refresh()
    assert rep3["delta_rows"] == 5
    assert _same(roll.read(), _expected(t, KEYS), KEYS)


def test_row_delete_triggers_full_rebuild(spark, tmp_path):
    """delete_where commits (operation=row-delete) remove rows, so the
    additive fold is invalid for them exactly like retention — the next
    refresh must rebuild from the live table, and the row-delete's ADDED
    survivor files must never be double-folded as an append delta."""
    t = EventTable(spark, str(tmp_path), "events")
    rows = [("t", i % 2, b"x", 1704067200000 + i * 1000, None, i) for i in range(12)]
    t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    roll = MaterializedRollup(t, str(tmp_path / "rollup"))
    roll.refresh()
    assert roll.read().agg(F.sum("n_events")).first()[0] == 12

    rep = t.delete_where("partition = 1")
    assert rep["rows_removed"] == 6
    rep2 = roll.refresh()
    assert rep2["rebuilt"] is True
    assert roll.read().agg(F.sum("n_events")).first()[0] == 6
    assert _same(roll.read(), _expected(t, KEYS), KEYS)
    # steady state after the rebuild: nothing new → no-op refresh
    assert roll.refresh()["to_version"] is None


def test_below_threshold_refresh_stays_on_unsharded_fast_path(spark, tmp_path, monkeypatch):
    """VERDICT r6 #8: the sharding layer must not tax the small-state
    case. Below shard_threshold_rows an incremental refresh takes the
    plain path — no _shard layout, no carry-forward calls, no n_shards
    in the pointer — and the state still equals a full recompute."""
    t = EventTable(spark, str(tmp_path), "events")
    roll = MaterializedRollup(t, str(tmp_path / "rollup"))  # default threshold 100k
    t.append(_batch(spark, 0, 40, hour_spread_ms=3_600_000))
    roll.refresh()

    calls = {"link": 0}
    real_link = MaterializedRollup._link_untouched_shards

    def spy(self, *a, **k):
        calls["link"] += 1
        return real_link(self, *a, **k)

    monkeypatch.setattr(MaterializedRollup, "_link_untouched_shards", spy)
    t.append(_batch(spark, 40, 10, hour_spread_ms=3_600_000))
    r = roll.refresh()
    assert r["delta_rows"] == 10
    assert calls["link"] == 0  # sharded machinery untouched
    ptr = roll._pointer()
    assert "n_shards" not in ptr
    state_dir = os.path.join(str(tmp_path / "rollup"), ptr["state_dir"])
    assert not any(d.startswith("_shard=") for d in os.listdir(state_dir))
    assert _same(roll.read(), _expected(t, KEYS), KEYS)


def test_mor_delete_triggers_full_rebuild(spark, tmp_path):
    """A merge-on-read takedown removes ROWS while removing no data file
    (its snapshot marker is added_deletes, removed stays empty) — the
    additive fold would keep counting the tombstoned rows, so the next
    refresh must rebuild from the live (deletes-applied) table. The
    tombstone-consuming compact afterwards stays on the additive path:
    the rows it drops were already invisible at the delete snapshot."""
    t = EventTable(spark, str(tmp_path), "events")
    rows = [("t", 0, b"x", 1704067200000 + i, None, i) for i in range(10)]
    t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    roll = MaterializedRollup(t, str(tmp_path / "rollup"))
    roll.refresh()
    assert roll.read().agg(F.sum("n_events")).first()[0] == 10

    rep = t.delete_where("sequence <= 4", mode="merge-on-read")
    assert rep["rows_removed"] == 4 and rep["files_rewritten"] == 0
    rep2 = roll.refresh()
    assert rep2["rebuilt"] is True
    assert roll.read().agg(F.sum("n_events")).first()[0] == 6
    assert _same(roll.read(), _expected(t, KEYS), KEYS)

    # consuming compact: additive path, state still exact
    t.compact(min_input_files=1, rewrite_all=True)
    assert t.delete_files() == []
    rep3 = roll.refresh()
    assert rep3["rebuilt"] is False
    assert _same(roll.read(), _expected(t, KEYS), KEYS)
