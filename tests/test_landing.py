"""Landing-zone write-plane semantics (streaming/landing.py): the
commit-log tier boundary, path normalization, and admission accounting.

The critical invariant: Spark's file source writes
``<ckpt>/sources/0/<batchId>`` at batch PLANNING time, before the sink
runs — ``<ckpt>/commits/<batchId>`` is what marks the batch durable.
Treating planned-as-seen would (a) let retention cleanup DELETE files a
crashed batch still needs to replay (acked-data loss) and (b) hide a
running batch's events from the hot tail tier for the whole batch
duration. These tests pin the commit-log boundary with hand-crafted
checkpoint state, no stream required."""

import json
import os

from zombi_spark.streaming.landing import LandingZone


def _plan_batch(ckpt: str, batch_id: int, paths: list[str]) -> None:
    """Write what Spark's FileStreamSource writes at planning time."""
    src = os.path.join(ckpt, "sources", "0")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, str(batch_id)), "w") as fh:
        fh.write("v1\n")
        for p in paths:
            fh.write(
                json.dumps({"path": f"file://{p}", "timestamp": 1, "batchId": batch_id})
                + "\n"
            )


def _commit_batch(ckpt: str, batch_id: int) -> None:
    """Write what the streaming engine writes after the sink succeeds."""
    commits = os.path.join(ckpt, "commits")
    os.makedirs(commits, exist_ok=True)
    with open(os.path.join(commits, str(batch_id)), "w") as fh:
        fh.write('v1\n{"nextBatchWatermarkMs":0}\n')


def test_planned_but_uncommitted_stays_unseen(tmp_path):
    zone = LandingZone(str(tmp_path / "land"), str(tmp_path / "ckpt"))
    landed = zone.produce("b0", [{"payload": "x"}])
    _plan_batch(str(tmp_path / "ckpt"), 0, [landed])
    # planned only: still hot, still backlog, NOT seen
    assert zone.checkpoint_seen_files() == set()
    assert zone.pending_files() == [landed]
    assert zone.backlog_bytes() > 0
    # commit lands: now seen, leaves the hot tier and the backlog
    _commit_batch(str(tmp_path / "ckpt"), 0)
    assert landed in zone.checkpoint_seen_files()
    assert zone.pending_files() == []
    assert zone.backlog_bytes() == 0


def test_cleanup_never_deletes_uncommitted_batch(spark, tmp_path):
    """T8 retention must not remove files a crashed batch would replay."""
    from zombi_spark.streaming.ingest import StreamingIngest
    from zombi_spark.table.event_table import EventTable

    ing = StreamingIngest(
        spark,
        str(tmp_path / "land"),
        EventTable(spark, str(tmp_path), "cleanup_t"),
        str(tmp_path / "ckpt"),
    )
    landed = ing.produce("b0", [{"payload": "x"}])
    _plan_batch(str(tmp_path / "ckpt"), 0, [landed])
    assert ing.cleanup_landing_zone() == []  # planned ≠ durable
    assert os.path.exists(landed)
    _commit_batch(str(tmp_path / "ckpt"), 0)
    assert ing.cleanup_landing_zone() == [landed]
    assert not os.path.exists(landed)


def test_relative_landing_dir_matches_checkpoint_uris(tmp_path, monkeypatch):
    """Checkpoint logs carry absolute file:// URIs; a zone built with
    RELATIVE paths must still recognize its own files as committed."""
    monkeypatch.chdir(tmp_path)
    zone = LandingZone("land", "ckpt")
    landed = zone.produce("b0", [{"payload": "x"}])
    assert os.path.isabs(landed)
    _plan_batch(str(tmp_path / "ckpt"), 0, [landed])
    _commit_batch(str(tmp_path / "ckpt"), 0)
    assert zone.pending_files() == []
    assert zone.backlog_bytes() == 0


def test_seen_cache_tracks_log_growth(tmp_path):
    zone = LandingZone(str(tmp_path / "land"), str(tmp_path / "ckpt"))
    a = zone.produce("a", [{"payload": "1"}])
    b = zone.produce("b", [{"payload": "2"}])
    _plan_batch(str(tmp_path / "ckpt"), 0, [a])
    _commit_batch(str(tmp_path / "ckpt"), 0)
    assert zone.checkpoint_seen_files() == {a}
    # cache must invalidate when a new batch plans + commits
    _plan_batch(str(tmp_path / "ckpt"), 1, [b])
    _commit_batch(str(tmp_path / "ckpt"), 1)
    assert zone.checkpoint_seen_files() == {a, b}
    # identical state: second call returns the cached set (same object)
    assert zone.checkpoint_seen_files() is zone.checkpoint_seen_files()
