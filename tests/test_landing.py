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


def test_produce_under_budget_does_no_directory_walk(tmp_path, monkeypatch):
    """O(1) admission accounting (handlers.rs:64-232's atomic in-flight
    counters): once the backlog counter is warm, an under-budget
    produce() must not list or stat the landing/checkpoint directories —
    at thousands of backlogged files the old walk made every write pay
    O(backlog) exactly when admission control matters."""
    from zombi_spark.streaming import landing as landing_mod

    zone = LandingZone(
        str(tmp_path / "land"), str(tmp_path / "ckpt"), byte_budget=1_000_000
    )
    zone.produce("warm", [{"payload": "x"}])  # first call pays the resync

    walks = {"n": 0}
    real_listdir, real_scandir = os.listdir, os.scandir

    def spy_listdir(path="."):
        walks["n"] += 1
        return real_listdir(path)

    def spy_scandir(path="."):
        walks["n"] += 1
        return real_scandir(path)

    monkeypatch.setattr(landing_mod.os, "listdir", spy_listdir)
    monkeypatch.setattr(landing_mod.os, "scandir", spy_scandir)
    for i in range(50):
        zone.produce(f"hot-{i}", [{"payload": f"p{i}"}])
    assert walks["n"] == 0, f"hot-path produce walked the directory {walks['n']}×"
    # counter tracked the landed bytes without any walk
    assert zone._cached_backlog() > 0 or walks["n"] == 0


def test_refusal_is_never_issued_from_a_stale_counter(tmp_path):
    """A would-be 503 recounts from the filesystem first: a drained zone
    is admitted again IMMEDIATELY, not a resync interval later (and the
    refusal itself reflects the true backlog, not the cached estimate)."""
    import pytest

    from zombi_spark.streaming.landing import AdmissionRejected

    zone = LandingZone(str(tmp_path / "land"), str(tmp_path / "ckpt"), byte_budget=256)
    with pytest.raises(AdmissionRejected):
        for i in range(64):
            zone.produce(f"b{i}", [{"payload": "x" * 32}])
    # simulate the stream draining everything, outside this process's view
    for f in os.listdir(zone.landing_dir):
        os.unlink(os.path.join(zone.landing_dir, f))
    # cached counter still says over budget — produce must resync + admit
    zone.produce("after-drain", [{"payload": "y"}])
    assert zone.admission_status()["status"] == 200


def test_seen_files_survive_percent_encoded_checkpoint_uris(tmp_path):
    """Round-6 review fix: Spark's source log records file:// URIs
    percent-encoded. A landing dir with a space (or any non-ASCII char)
    must still resolve committed files — the old prefix-strip left %20
    in the path, so every committed file stayed 'pending' forever
    (cleanup never fired, the hot tier served committed rows twice, and
    the byte budget filled with already-ingested files)."""
    import urllib.parse

    land = tmp_path / "land ing"
    zone = LandingZone(str(land), str(tmp_path / "ckpt"))
    landed = zone.produce("b0", [{"payload": "x"}])
    assert " " in landed
    uri = "file://" + urllib.parse.quote(landed)
    _plan_batch(str(tmp_path / "ckpt"), 0, [])  # helper writes raw paths
    # hand-write the entry exactly as Spark does: quoted URI
    src = os.path.join(str(tmp_path / "ckpt"), "sources", "0")
    with open(os.path.join(src, "0"), "w") as fh:
        fh.write("v1\n")
        fh.write(json.dumps({"path": uri, "timestamp": 1, "batchId": 0}) + "\n")
    _commit_batch(str(tmp_path / "ckpt"), 0)
    assert zone.checkpoint_seen_files() == {landed}
    assert zone.pending_files() == []
