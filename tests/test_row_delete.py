"""Row-level DELETE (copy-on-write takedown) — ``EventTable.delete_where``.

The reference can only age out whole hours (rocksdb.rs:1150-1237
``delete_range``); a training-data pipeline also needs targeted removal
(takedown / right-to-be-forgotten). Contract under test:

- SQL DELETE semantics (TRUE removed, FALSE **and NULL** kept), proven
  against an independent DuckDB DELETE over the same pre-delete rows;
- file-level skipping: files with zero matches are never rewritten;
- no-op deletes mint no snapshot;
- time travel still serves deleted rows until expiration, and the
  delete → expire_snapshots → remove_orphans workflow physically erases;
- watermarks carry forward (sequences stay monotonic across deletes).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from zombi_spark.ingest.batch import RAW_EVENT_SCHEMA, prepare_events
from zombi_spark.table.event_table import EventTable

HOUR = 3600 * 1000
BASE = 1704067200000  # 2024-01-01T00:00Z


def _batch(spark, start_seq, ts0, n, step_ms=60_000, part_mod=4, keys="unique"):
    def _key(i):
        if i % 2 != 0:
            return None  # every other row unkeyed (exercises NULL handling)
        # "mod7" mints repeating keys — idempotent-write dedup (D1) then
        # drops the repeats, which the parity test tolerates (it compares
        # against the table's own post-dedup content); every other test
        # needs predictable row counts, so keys default to unique
        return f"k{i % 7}" if keys == "mod7" else f"k{start_seq + i}"

    rows = [
        ("t", i % part_mod, b"x", ts0 + i * step_ms, _key(i), start_seq + i)
        for i in range(n)
    ]
    return prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA))


def test_delete_where_matches_duckdb_delete(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(_batch(spark, 0, BASE, 120, keys="mod7"))
    t.append(_batch(spark, 120, BASE + 3 * HOUR, 80))
    before = t.read().select("sequence", "partition", "idempotency_key").toPandas()

    rep = t.delete_where(F.col("idempotency_key") == "k3")
    assert rep["rows_removed"] > 0 and rep["files_rewritten"] > 0

    # independent oracle: DuckDB DELETE over the identical pre-delete rows
    con = duckdb.connect()
    con.register("pre", before)
    con.execute("CREATE TABLE o AS SELECT * FROM pre")
    con.execute("DELETE FROM o WHERE idempotency_key = 'k3'")
    expected = sorted(r[0] for r in con.execute("SELECT sequence FROM o").fetchall())
    got = sorted(r["sequence"] for r in t.read().select("sequence").collect())
    assert got == expected
    # NULL-predicate rows (unkeyed) are kept — the IS-NOT-TRUE rule
    assert t.read().where(F.col("idempotency_key").isNull()).count() == int(
        before["idempotency_key"].isna().sum()
    )


def test_unmatched_files_are_not_rewritten(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(_batch(spark, 0, BASE, 60))  # hour 0
    day1_paths = {e["file_path"] for e in t.files()}
    t.append(_batch(spark, 60, BASE + 24 * HOUR, 60))  # next day

    rep = t.delete_where(F.col("timestamp_ms") >= BASE + 24 * HOUR)
    assert rep["rows_removed"] == 60
    after = {e["file_path"] for e in t.files()}
    # every day-1 file survives AS THE SAME FILE — zero-match files are
    # carried forward in metadata, never rewritten
    assert day1_paths <= after
    # caller-supplied bounds prune the candidate set metadata-only: a
    # second delete scoped away from all remaining data is a no-op
    rep2 = t.delete_where(
        F.col("partition") >= 0, ts_min=BASE + 48 * HOUR
    )
    assert rep2.get("noop") is True and rep2["rows_removed"] == 0


def test_noop_delete_mints_no_snapshot(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(_batch(spark, 0, BASE, 30))
    v1 = t.latest_version()
    rep = t.delete_where("idempotency_key = 'does-not-exist'")
    assert rep.get("noop") is True
    assert t.latest_version() == v1


def test_time_travel_and_guaranteed_erasure(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(_batch(spark, 0, BASE, 60))
    v_before = t.latest_version()
    rep = t.delete_where("partition = 1")
    assert rep["rows_removed"] == t.read(version=v_before).where("partition = 1").count()
    # pre-delete snapshot still serves the doomed rows (audit window)
    assert t.read(version=v_before).count() == 60
    assert t.read().where("partition = 1").count() == 0
    # guaranteed-erasure workflow: expire + orphan reap physically
    # removes the pre-delete files, live data intact
    t.expire_snapshots(keep_last=1)
    removed = t.remove_orphans(older_than_s=0)
    assert removed
    assert t.read().where("partition = 1").count() == 0
    assert t.read().count() == 60 - rep["rows_removed"]


def test_whole_file_delete_leaves_no_replacement(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(_batch(spark, 0, BASE, 40))          # hour 0 only
    t.append(_batch(spark, 40, BASE + HOUR, 40))  # hour 1 only
    n_files = len(t.files())
    rep = t.delete_where(F.col("timestamp_ms") < BASE + HOUR)
    assert rep["rows_removed"] == 40
    # the hour-0 file(s) matched entirely: removed from metadata with no
    # rewritten survivor file taking their place
    assert len(t.files()) == n_files - rep["files_rewritten"]
    assert t.read().count() == 40


def test_watermarks_survive_delete(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(_batch(spark, 0, BASE, 50))
    wm = t.watermark_map()
    t.delete_where("partition = 2")
    assert t.watermark_map() == wm
    # a later append seeded from the POST-DELETE watermarks keeps
    # assigning per-(topic,partition) sequences ABOVE the pre-delete
    # highs — deleting rows never rewinds sequence assignment
    # seed from the SNAPSHOT watermark map (the streaming writer's path),
    # not a data-derived max: a partition whose rows were all deleted has
    # no surviving data row, but its committed watermark must still gate
    # new sequences (INV-1 outlives the data)
    rows = [
        ("t", i % 4, b"y", BASE + 2 * HOUR + i * 1000, None, i) for i in range(12)
    ]
    base_frame = spark.createDataFrame(
        [(tp, p, s) for (tp, p), s in t.watermark_map().items()],
        "topic string, partition int, _base_seq long",
    )
    t.append(
        prepare_events(
            spark.createDataFrame(rows, RAW_EVENT_SCHEMA), watermarks=base_frame
        )
    )
    wm_after = t.watermark_map()
    assert all(wm_after[k] > wm[k] for k in wm)


def test_concurrent_append_delete_no_lost_commit(spark, tmp_path):
    """M3 for row deletes: an append landing between delete planning and
    its commit must not be dropped — the delete detects the stale parent
    and rebases its immutable (added, removed) delta once; both commits
    survive and the raced append's watermark carries into the delete
    snapshot (the compact rebase rule, compaction.rs:98-137)."""
    import unittest.mock as mock

    t = EventTable(spark, str(tmp_path), "events")
    t.append(_batch(spark, 0, BASE, 60))
    doomed = t.read().where("partition = 1").count()

    raced = {"done": False}
    real_commit = EventTable._commit_snapshot

    def _racing_commit(self, summary, **kw):
        if summary.get("operation") == "row-delete" and not raced["done"]:
            raced["done"] = True
            t2 = EventTable(spark, str(tmp_path), "events")
            rows = [("race", 0, b"r", BASE + 5 * HOUR + i, None, i) for i in range(4)]
            t2.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
        return real_commit(self, summary, **kw)

    with mock.patch.object(EventTable, "_commit_snapshot", _racing_commit):
        rep = t.delete_where("partition = 1")

    assert raced["done"] and rep["rows_removed"] == doomed
    # neither commit was lost
    assert t.read().where("topic = 'race'").count() == 4
    assert t.read().count() == 60 - doomed + 4
    assert t.read().where("partition = 1 AND topic = 't'").count() == 0
    assert "zombi.watermark.race/0" in t.latest_snapshot()["watermarks"]


def test_delete_survivor_files_stay_sorted(spark, tmp_path):
    """Rewritten files keep the (timestamp_ms, sequence) within-file
    order the scan path's row-group skipping depends on."""
    import pyarrow.parquet as pq

    t = EventTable(spark, str(tmp_path), "events")
    t.append(_batch(spark, 0, BASE, 200, step_ms=10_000))
    rep = t.delete_where("partition = 0")
    assert rep["files_rewritten"] > 0
    rewritten = [e for e in t.files() if "/deleted-" in e["file_path"] or
                 e["file_path"].split("/")[-1].startswith("deleted-")]
    assert rewritten
    for e in rewritten:
        tbl = pq.read_table(e["file_path"], columns=["timestamp_ms", "sequence"])
        ts = tbl.column("timestamp_ms").to_pylist()
        assert ts == sorted(ts)
