"""TableFollower: checkpointed incremental consumption — delivery is
exactly-once per committed position, resumes across restarts, and is
unaffected by compaction (read_changes excludes rewrite snapshots)."""

from zombi_spark.ingest.batch import RAW_EVENT_SCHEMA, prepare_events
from zombi_spark.streaming.follower import TableFollower
from zombi_spark.table.event_table import EventTable


def _batch(spark, start, n):
    rows = [("t", 0, f"p{i}".encode(), 1704067200000 + i * 1000, None, i) for i in range(start, start + n)]
    return spark.createDataFrame(rows, RAW_EVENT_SCHEMA)


def test_follow_delivers_each_append_once(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    f = TableFollower(t, "pipeline-a")

    # nothing yet
    changes, to_v = f.poll()
    assert to_v is None and changes.count() == 0

    t.append(prepare_events(_batch(spark, 0, 5)))
    t.append(prepare_events(_batch(spark, 5, 3)))
    seen: list[int] = []
    assert f.process(lambda df, v: seen.append(df.count())) == 1
    assert seen == [8]  # both pending versions in one delivery

    # no double delivery once committed
    assert f.process(lambda df, v: seen.append(df.count())) is None

    t.append(prepare_events(_batch(spark, 8, 4)))
    assert f.process(lambda df, v: seen.append(df.count())) == 2
    assert seen == [8, 4]


def test_follow_position_survives_restart_and_crash_replays(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    TableFollower(t, "g").process(lambda df, v: None)  # no-op: empty table
    t.append(prepare_events(_batch(spark, 0, 6)))
    f = TableFollower(t, "g")

    # a crash mid-batch (fn raises) must NOT advance the position
    try:
        f.process(lambda df, v: (_ for _ in ()).throw(RuntimeError("boom")))
    except RuntimeError:
        pass
    assert f.position is None

    # a fresh follower instance (new process) replays then commits
    f2 = TableFollower(t, "g")
    assert f2.process(lambda df, v: None) == 0
    assert TableFollower(t, "g").position == 0

    # independent groups keep independent positions
    assert TableFollower(t, "other").position is None


def test_follow_across_compaction_no_double_delivery(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    for s in range(3):
        t.append(prepare_events(_batch(spark, s * 4, 4)))
    f = TableFollower(t, "g")
    counts: list[int] = []
    f.process(lambda df, v: counts.append(df.count()))
    assert counts == [12]

    t.compact(min_input_files=2)  # rewrite snapshot — not new data
    changes, to_v = f.poll()
    assert changes.count() == 0  # compaction delivers nothing...
    f.process(lambda df, v: counts.append(df.count()))  # ...but advances past it
    t.append(prepare_events(_batch(spark, 12, 2)))
    f.process(lambda df, v: counts.append(df.count()))
    assert counts == [12, 0, 2]


def test_expire_snapshots_protects_live_follower_window(spark, tmp_path, caplog):
    """r15 retention-vs-consumer-lag guard: expire_snapshots refuses to
    kill the snapshot window a registered follower still needs — BEFORE
    the history is gone (the r14 added_files error fires after). The
    safe prefix still expires, the lagging group is named in a warning,
    and catching up (or protect_followers=False) releases the rest."""
    import logging

    import pytest

    t = EventTable(spark, str(tmp_path), "events")
    for s in range(5):
        t.append(prepare_events(_batch(spark, s * 4, 4)))  # versions 0..4
    f = TableFollower(t, "pipeline")
    f.commit(1)  # processed through version 1; still needs 2..4

    with caplog.at_level(logging.WARNING):
        expired = t.expire_snapshots(keep_last=1)
    # unguarded keep_last=1 would expire 0..3; the guard stops at the
    # follower's position: only versions ≤ 1 go
    assert expired == [0, 1]
    assert any("pipeline" in r.message for r in caplog.records)
    # the follower's incremental read still works over the kept window
    changes, to_v = f.poll()
    assert to_v == 4 and changes.count() == 12
    f.commit(to_v)

    # caught up: the remaining backlog expires normally, silently
    assert t.expire_snapshots(keep_last=1) == [2, 3]

    # a new lagging group can be overridden explicitly — after which its
    # poll fails with the retention-lag contract error, not a phantom
    for s in range(5, 8):
        t.append(prepare_events(_batch(spark, s * 4, 4)))  # versions 5..7
    g = TableFollower(t, "stale-group")
    g.commit(4)
    # snapshot 4 is already processed — only it expires; 5..6 held
    assert t.expire_snapshots(keep_last=1) == [4]
    expired = t.expire_snapshots(keep_last=1, protect_followers=False)
    assert expired == [5, 6]
    with pytest.raises(ValueError, match="retention window"):
        g.poll()
