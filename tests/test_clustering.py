"""Compaction rewrite strategies (table/clustering.py): sort / z-order
re-clustering — Iceberg's ``rewrite_data_files`` strategy surface over
our snapshot log. The contract: rows are preserved EXACTLY; only the
layout changes, and per-file bounds become tight enough that
stats-based file skipping (EventTable.scan_files, same bounds the zombi
data source prunes on) works on the clustered columns.
"""

import pyspark.sql.functions as F
import pytest

from zombi_spark.ingest.batch import RAW_EVENT_SCHEMA, prepare_events
from zombi_spark.table.clustering import column_bounds, zorder_value
from zombi_spark.table.event_table import EventTable

T0 = 1704067200000  # one hour holds every row -> ONE storage partition


def _grid_batch(spark, start, n):
    """Rows interleaving producer partition (0-7) and time inside the
    hour — the worst case for bin-packed layout, the showcase for
    clustering."""
    rows = [
        (
            "t",
            i % 8,
            f"p{i}".encode(),
            T0 + (i * 7919) % 3_600_000,  # pseudo-shuffled within the hour
            None,
            i,
        )
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(rows, RAW_EVENT_SCHEMA)


def _build(spark, tmp_path, name):
    t = EventTable(spark, str(tmp_path), name)
    for s in range(4):
        t.append(prepare_events(_grid_batch(spark, s * 200, 200)))
    return t


def _admitted(t, **kw):
    return len(t.scan_files(**kw))


def test_zorder_value_matches_python_interleave(spark):
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 7), (3, 7), (2, 5)], "a long, b long"
    )
    bounds = column_bounds(df, ["a", "b"])
    assert bounds == {"a": (0, 3), "b": (0, 7)}
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", zorder_value(["a", "b"], bounds, bits=4)).collect()
    }

    def norm(v, mn, mx):
        return max(0, min(15, int((v - mn) * (15 / (mx - mn)))))

    def interleave(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == interleave(norm(a, 0, 3), norm(b, 0, 7)), (a, b)


def test_zorder_rewrite_preserves_rows_and_prunes_both_dimensions(spark, tmp_path):
    t = _build(spark, tmp_path, "zorder")
    before = sorted(map(tuple, t.read().collect()))
    snap = t.compact(
        strategy="zorder",
        sort_columns=["timestamp_ms", "partition"],
        rewrite_all=True,
        min_input_files=1,
        target_files_per_partition=4,
    )
    assert snap["strategy"] == "zorder"
    assert sorted(map(tuple, t.read().collect())) == before  # INV-6
    total = _admitted(t)
    assert total >= 4
    # both dimensions prune: each file is a z-rectangle, so a single
    # producer partition and a narrow time slice each exclude files
    assert _admitted(t, partition=0) < total
    assert _admitted(t, ts_min=T0, ts_max=T0 + 400_000) < total


def test_binpack_layout_cannot_prune_the_interleaved_dimension(spark, tmp_path):
    t = _build(spark, tmp_path, "binpack")
    t.compact(
        rewrite_all=True, min_input_files=1, target_files_per_partition=4
    )
    total = _admitted(t)
    assert total >= 4
    # time sort -> time prunes perfectly ...
    assert _admitted(t, ts_min=T0, ts_max=T0 + 400_000) < total
    # ... but every file spans every producer partition
    assert _admitted(t, partition=0) == total


def test_sort_strategy_clusters_leading_column(spark, tmp_path):
    t = _build(spark, tmp_path, "sorted")
    t.compact(
        strategy="sort",
        sort_columns=["partition", "timestamp_ms"],
        rewrite_all=True,
        min_input_files=1,
        target_files_per_partition=4,
    )
    total = _admitted(t)
    assert total >= 4
    assert _admitted(t, partition=0) < total


def test_strategy_validation(spark, tmp_path):
    t = _build(spark, tmp_path, "bad")
    with pytest.raises(ValueError, match="cannot cluster"):
        t.compact(strategy="sort", sort_columns=["payload"], rewrite_all=True,
                  min_input_files=1)
    with pytest.raises(ValueError, match="numeric"):
        t.compact(strategy="zorder", sort_columns=["topic", "partition"],
                  rewrite_all=True, min_input_files=1)
    with pytest.raises(ValueError, match="requires sort_columns"):
        t.compact(strategy="zorder", rewrite_all=True, min_input_files=1)
    with pytest.raises(ValueError, match="unknown strategy"):
        t.compact(strategy="cluster", sort_columns=["partition", "sequence"],
                  rewrite_all=True, min_input_files=1)
    with pytest.raises(ValueError, match="2-3 columns"):
        zorder_value(["a"], {"a": (0, 1)})


def test_time_travel_across_clustered_rewrite(spark, tmp_path):
    t = _build(spark, tmp_path, "travel")
    v_before = t.latest_version()
    n_before = t.read(version=v_before).count()
    t.compact(
        strategy="zorder",
        sort_columns=["timestamp_ms", "partition"],
        rewrite_all=True,
        min_input_files=1,
        target_files_per_partition=2,
    )
    assert t.read(version=v_before).count() == n_before
    assert t.read().count() == n_before


def test_policy_scheduled_recluster(spark, tmp_path):
    """MaintenancePolicy runs a periodic clustered rewrite (the nightly
    z-order job): immediately due once configured, then again only after
    the window elapses; a tick where both re-cluster and small-file
    compact are due runs ONE rewrite (re-layout subsumes compaction)."""
    from zombi_spark.table.maintenance import MaintenancePolicy

    t = _build(spark, tmp_path, "policy")
    fake = {"now": 0.0}
    policy = MaintenancePolicy(
        t,
        recluster_every_s=100.0,
        recluster_columns=["timestamp_ms", "partition"],
        recluster_target_files=4,
        compact_trigger_files=1,  # plain compact would also be due
        clock=lambda: fake["now"],
    )
    before = t.read().count()
    acts = policy.run_due()
    kinds = [a["action"] for a in acts]
    assert "recluster" in kinds and "compact" not in kinds
    assert all(a["ok"] for a in acts if a["action"] == "recluster")
    assert t.latest_snapshot()["strategy"] == "zorder"
    assert t.read().count() == before
    total = len(t.scan_files())
    assert len(t.scan_files(partition=0)) < total  # clustered bounds

    # quiesce plain compaction from here: its commits would legitimately
    # count as "the table changed" and defeat the unchanged-version check
    policy.compact_trigger_files = 10**9
    policy.compact_max_age_s = 10**9
    # not due again inside the window
    fake["now"] = 50.0
    assert "recluster" not in [a["action"] for a in policy.run_due()]
    # window elapsed but the table version is UNCHANGED since the last
    # rewrite: skipped — re-laying-out identical data would churn every
    # file and a snapshot for nothing (ADVICE r13 change detection)
    fake["now"] = 150.0
    assert "recluster" not in [a["action"] for a in policy.run_due()]
    # new data lands -> the elapsed window fires again
    t.append(prepare_events(_grid_batch(spark, 800, 50)))
    assert "recluster" in [a["action"] for a in policy.run_due()]

    with pytest.raises(ValueError, match="recluster_columns"):
        MaintenancePolicy(t, recluster_every_s=10.0)
    # misconfigured clustering specs fail at CONSTRUCTION, not on every
    # tick forever (ADVICE r13 fail-fast): zorder arity + unknown column
    with pytest.raises(ValueError, match="2-3 columns"):
        MaintenancePolicy(
            t, recluster_every_s=10.0, recluster_columns=["timestamp_ms"]
        )
    with pytest.raises(ValueError, match="cannot cluster"):
        MaintenancePolicy(
            t,
            recluster_every_s=10.0,
            recluster_strategy="sort",
            recluster_columns=["payload"],
        )


def test_clustered_rewrite_over_http(spark, tmp_path):
    """The /compact route exposes the rewrite-strategy params (M1 over
    HTTP, handlers.rs:1379-1408 + the r13 strategy surface); validation
    errors are 400s."""
    import json as _json
    import urllib.error
    import urllib.request

    from zombi_spark.streaming.http_edge import HttpIngestEdge
    from zombi_spark.streaming.ingest import StreamingIngest

    t = _build(spark, tmp_path, "http-cluster")
    ing = StreamingIngest(
        spark, str(tmp_path / "landing"), t, str(tmp_path / "ckpt")
    )

    def resolver(name, create):
        if name != "http-cluster":
            raise KeyError(name)
        return ing

    with HttpIngestEdge(resolver) as srv:
        url = (
            f"{srv.base_url}/tables/http-cluster/compact?strategy=zorder"
            "&sort_columns=timestamp_ms,partition&rewrite_all=true"
            "&target_files_per_partition=4&min_input_files=1"
        )
        req = urllib.request.Request(url, data=b"", method="POST")
        with urllib.request.urlopen(req, timeout=600) as resp:
            body = _json.loads(resp.read())
        assert resp.status == 200 and body["files_rewritten"] >= 4
        assert t.latest_snapshot()["strategy"] == "zorder"
        assert t.read().count() == 800

        bad = urllib.request.Request(
            f"{srv.base_url}/tables/http-cluster/compact?strategy=nope"
            "&sort_columns=partition,sequence&rewrite_all=true&min_input_files=1",
            data=b"",
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(bad, timeout=600)
        assert exc_info.value.code == 400

        # r14 partition scoping over HTTP: a scope naming no real dir is
        # a clean no-op (0 files rewritten), not an error
        import urllib.parse as _up

        scoped = urllib.request.Request(
            f"{srv.base_url}/tables/http-cluster/compact?rewrite_all=true"
            f"&min_input_files=1&partitions={_up.quote('no/such=dir')}",
            data=b"",
            method="POST",
        )
        with urllib.request.urlopen(scoped, timeout=600) as resp:
            body = _json.loads(resp.read())
        assert body["files_rewritten"] == 0


def _two_hour_batch(spark, start, n, hour):
    """Rows interleaving producer partitions inside ONE given hour —
    lets a table span two storage partitions deterministically."""
    rows = [
        (
            "t",
            i % 8,
            f"p{i}".encode(),
            T0 + hour * 3_600_000 + (i * 7919) % 3_600_000,
            None,
            i,
        )
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(rows, RAW_EVENT_SCHEMA)


def test_compact_partitions_scope_limits_the_rewrite(spark, tmp_path):
    """compact(partitions=[dir]) touches ONLY the named storage
    partition: the other dir's file paths survive byte-identical — the
    Iceberg rewrite_data_files(where => ...) shape at partition
    granularity."""
    t = EventTable(spark, str(tmp_path), "scoped")
    for s in range(2):
        t.append(prepare_events(_two_hour_batch(spark, s * 100, 100, hour=0)))
        t.append(prepare_events(_two_hour_batch(spark, s * 100, 100, hour=1)))
    dirs = sorted({f["partition_dir"] for f in t.files()})
    assert len(dirs) == 2
    before = t.read().count()
    other_files = {f["file_path"] for f in t.files() if f["partition_dir"] == dirs[1]}
    r = t.compact(
        strategy="sort",
        sort_columns=["partition", "timestamp_ms"],
        rewrite_all=True,
        min_input_files=1,
        partitions=[dirs[0]],
    )
    assert r["partitions"] == [dirs[0]]
    after_other = {f["file_path"] for f in t.files() if f["partition_dir"] == dirs[1]}
    assert after_other == other_files  # untouched dir keeps its exact files
    assert t.read().count() == before
    # scoping to a dir with nothing to rewrite is a snapshot-free no-op
    assert t.compact(partitions=["nope"], rewrite_all=True, min_input_files=1)["noop"]


def test_policy_recluster_is_incremental_after_first_rewrite(spark, tmp_path):
    """The scheduled re-cluster rewrites ONLY dirty partitions (r14):
    after the initial full rewrite, an append into one hour dirties that
    dir alone — the next window's rewrite names just it and the clean
    dir's files survive untouched. A binpack compact also dirties its
    dirs (it de-clusters them), so the window after one re-clusters
    them again."""
    from zombi_spark.table.maintenance import MaintenancePolicy

    t = EventTable(spark, str(tmp_path), "incr")
    for s in range(2):
        t.append(prepare_events(_two_hour_batch(spark, s * 100, 100, hour=0)))
        t.append(prepare_events(_two_hour_batch(spark, s * 100, 100, hour=1)))
    dirs = sorted({f["partition_dir"] for f in t.files()})
    fake = {"now": 0.0}
    policy = MaintenancePolicy(
        t,
        recluster_every_s=100.0,
        recluster_columns=["timestamp_ms", "partition"],
        recluster_target_files=2,
        compact_trigger_files=10**9,
        compact_max_age_s=10**9,
        clock=lambda: fake["now"],
    )
    acts = policy.run_due()
    first = [a for a in acts if a["action"] == "recluster"]
    assert first and first[0]["ok"]
    assert first[0]["result"]["partitions"] == dirs  # initial: full table

    # dirty ONE dir with an append; the other stays clean
    t.append(prepare_events(_two_hour_batch(spark, 500, 60, hour=0)))
    clean_files = {f["file_path"] for f in t.files() if f["partition_dir"] == dirs[1]}
    fake["now"] = 150.0
    acts = policy.run_due()
    second = [a for a in acts if a["action"] == "recluster"]
    assert second and second[0]["ok"]
    assert second[0]["result"]["partitions"] == [dirs[0]]  # only the dirty dir
    assert {
        f["file_path"] for f in t.files() if f["partition_dir"] == dirs[1]
    } == clean_files

    # a plain binpack compact de-clusters dirs[1] -> dirty again
    t.append(prepare_events(_two_hour_batch(spark, 600, 60, hour=1)))
    t.compact(min_input_files=1)  # binpack over the small files
    fake["now"] = 300.0
    acts = policy.run_due()
    third = [a for a in acts if a["action"] == "recluster"]
    assert third and third[0]["ok"]
    assert dirs[1] in third[0]["result"]["partitions"]
    # every row still present after three generations of rewrites
    assert t.read().count() == 520


def test_policy_recovers_recluster_watermark_across_restart(spark, tmp_path):
    """A RESTARTED policy must not pay a full-table rewrite: the last
    re-cluster's snapshot (operation compact + matching strategy and
    columns) is recovered from the log at construction, so an unchanged
    table stays untouched and a dirtied dir is rewritten alone."""
    from zombi_spark.table.maintenance import MaintenancePolicy

    t = EventTable(spark, str(tmp_path), "recover")
    for s in range(2):
        t.append(prepare_events(_two_hour_batch(spark, s * 100, 100, hour=0)))
        t.append(prepare_events(_two_hour_batch(spark, s * 100, 100, hour=1)))
    dirs = sorted({f["partition_dir"] for f in t.files()})
    kw = dict(
        recluster_every_s=100.0,
        recluster_columns=["timestamp_ms", "partition"],
        recluster_target_files=2,
        compact_trigger_files=10**9,
        compact_max_age_s=10**9,
    )
    p1 = MaintenancePolicy(t, **kw)
    acts = p1.run_due()
    assert [a for a in acts if a["action"] == "recluster"][0]["ok"]
    v_recluster = t.latest_version()

    # restart: a FRESH policy recovers the watermark from the log
    p2 = MaintenancePolicy(t, **kw)
    assert p2._last_recluster_version == v_recluster
    assert "recluster" not in [a["action"] for a in p2.run_due()]  # unchanged

    t.append(prepare_events(_two_hour_batch(spark, 500, 60, hour=1)))
    clean = {f["file_path"] for f in t.files() if f["partition_dir"] == dirs[0]}
    acts = p2.run_due()
    rec = [a for a in acts if a["action"] == "recluster"]
    assert rec and rec[0]["ok"]
    assert rec[0]["result"]["partitions"] == [dirs[1]]  # only the dirty dir
    assert {f["file_path"] for f in t.files() if f["partition_dir"] == dirs[0]} == clean

    # a policy with DIFFERENT columns must not trust that snapshot
    p3 = MaintenancePolicy(
        t,
        recluster_every_s=100.0,
        recluster_columns=["sequence", "partition"],
        recluster_target_files=2,
    )
    assert p3._last_recluster_version is None


def test_cluster_on_extracted_integer_column(spark, tmp_path):
    """r14: extracted integer columns carry col_stats bounds, so they
    are CLUSTERABLE — sort or z-order by an extracted id re-layouts the
    files into disjoint id ranges the data source prunes on."""
    import json as _json

    from pyspark.sql.datasource import EqualTo, GreaterThan

    from zombi_spark.ingest.extraction import FieldSpec, TableSchemaConfig
    from zombi_spark.sources.datasource import ZombiBatchReader

    cfg = TableSchemaConfig(
        payload_format="json",
        fields=[FieldSpec(name="account_id", json_path="a", data_type="int64")],
    )
    t = EventTable(spark, str(tmp_path), "byid", schema_config=cfg)
    # one hour, ids interleaved across appends: binpack bounds on
    # account_id cover everything, clustering is the only separator
    for s in range(3):
        rows = [
            ("t", i % 4, _json.dumps({"a": (i * 31 + s) % 400}).encode(),
             T0 + (i * 977) % 3_600_000, None, s * 200 + i)
            for i in range(200)
        ]
        t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    before = t.read().count()

    def _kept(value_op):
        reader = ZombiBatchReader(t.table_schema(), {"path": t.path})
        reader.pushFilters([value_op])
        reader.partitions()
        return reader.last_plan["files_kept"], reader.last_plan["files_total"]

    t.compact(
        strategy="sort",
        sort_columns=["account_id"],
        rewrite_all=True,
        min_input_files=1,
        target_files_per_partition=6,
    )
    assert t.read().count() == before  # INV-6 across the id re-layout
    kept, total = _kept(EqualTo(("account_id",), 57))
    assert 0 < kept < total
    kept_hi, _ = _kept(GreaterThan(("account_id",), 395))
    assert 0 < kept_hi < total
    # values equal across layouts
    assert t.read().where("account_id = 57").count() > 0

    # z-order with an extracted dimension validates and prunes both dims
    t.compact(
        strategy="zorder",
        sort_columns=["timestamp_ms", "account_id"],
        rewrite_all=True,
        min_input_files=1,
        target_files_per_partition=6,
    )
    assert t.read().count() == before
    kept_z, total_z = _kept(EqualTo(("account_id",), 57))
    assert 0 < kept_z < total_z

    # a non-existent column still fails fast, message naming both sets
    with pytest.raises(ValueError, match="extracted stat columns"):
        t.compact(strategy="sort", sort_columns=["nope"], rewrite_all=True,
                  min_input_files=1)


def test_recluster_watermark_survives_interleaved_append(spark, tmp_path):
    """ADVICE r14 (medium): an append committed between the policy's
    dirty-set read and the rewrite's commit must NOT land below the new
    watermark — the policy keeps the pre-rewrite version as the
    watermark when the commit rebased, so the NEXT window re-scans the
    interleaved commit and re-clusters its partitions."""
    from zombi_spark.table.maintenance import MaintenancePolicy

    t = EventTable(spark, str(tmp_path), "race")
    for s in range(2):
        t.append(prepare_events(_two_hour_batch(spark, s * 100, 100, hour=0)))
        t.append(prepare_events(_two_hour_batch(spark, s * 100, 100, hour=1)))
    dirs = sorted({f["partition_dir"] for f in t.files()})
    fake = {"now": 0.0}
    policy = MaintenancePolicy(
        t,
        recluster_every_s=100.0,
        recluster_columns=["timestamp_ms", "partition"],
        recluster_target_files=2,
        compact_trigger_files=10**9,
        compact_max_age_s=10**9,
        clock=lambda: fake["now"],
    )
    assert [a for a in policy.run_due() if a["action"] == "recluster"][0]["ok"]

    # window 2: dirty dirs[0], and RACE an append into dirs[1] after the
    # policy has read its dirty set but before the rewrite commits
    t.append(prepare_events(_two_hour_batch(spark, 500, 40, hour=0)))
    real_cp = t.changed_partitions

    def racing_cp(since):
        dirty = real_cp(since)
        t.append(prepare_events(_two_hour_batch(spark, 600, 40, hour=1)))
        return dirty

    t.changed_partitions = racing_cp
    v_pre = t.latest_version()  # what the policy observes as `pre`
    fake["now"] = 150.0
    try:
        acts = policy.run_due()
    finally:
        del t.changed_partitions  # restore the bound method
    rec = [a for a in acts if a["action"] == "recluster"]
    assert rec and rec[0]["ok"]
    assert rec[0]["result"]["partitions"] == [dirs[0]]  # raced append unseen
    # rebased commit (pre + 2) ⇒ watermark stays at the PRE version …
    assert rec[0]["result"]["version"] == v_pre + 2
    assert policy._last_recluster_version == v_pre

    # … so the next window still sees the interleaved append as dirty
    fake["now"] = 300.0
    acts = policy.run_due()
    rec = [a for a in acts if a["action"] == "recluster"]
    assert rec and rec[0]["ok"]
    assert dirs[1] in rec[0]["result"]["partitions"]
    assert t.read().count() == 480


def test_manual_scoped_compact_does_not_poison_watermark_recovery(spark, tmp_path):
    """ADVICE r14 (low): a MANUAL partition-scoped compact with the same
    strategy+columns looks like a policy re-cluster in the snapshot log,
    but proves only its own dirs were clustered. Restart recovery must
    skip it (summary ``scoped``) and resume from the policy's own last
    rewrite, so partitions dirtied before the scoped compact are still
    re-scanned."""
    from zombi_spark.table.maintenance import MaintenancePolicy

    t = EventTable(spark, str(tmp_path), "scoped")
    for s in range(2):
        t.append(prepare_events(_two_hour_batch(spark, s * 100, 100, hour=0)))
        t.append(prepare_events(_two_hour_batch(spark, s * 100, 100, hour=1)))
    dirs = sorted({f["partition_dir"] for f in t.files()})
    kw = dict(
        recluster_every_s=100.0,
        recluster_columns=["timestamp_ms", "partition"],
        recluster_target_files=2,
        compact_trigger_files=10**9,
        compact_max_age_s=10**9,
    )
    p1 = MaintenancePolicy(t, **kw)
    assert [a for a in p1.run_due() if a["action"] == "recluster"][0]["ok"]
    v_full = t.latest_version()

    # dirty BOTH dirs, then a user manually re-clusters only dirs[0]
    t.append(prepare_events(_two_hour_batch(spark, 500, 40, hour=0)))
    t.append(prepare_events(_two_hour_batch(spark, 600, 40, hour=1)))
    r = t.compact(
        strategy="zorder",
        sort_columns=["timestamp_ms", "partition"],
        rewrite_all=True,
        min_input_files=1,
        partitions=[dirs[0]],
    )
    assert t.latest_snapshot().get("scoped") is True

    # restart: recovery must NOT trust the scoped compact's version
    p2 = MaintenancePolicy(t, **kw)
    assert p2._last_recluster_version == v_full
    acts = p2.run_due()
    rec = [a for a in acts if a["action"] == "recluster"]
    assert rec and rec[0]["ok"]
    # the window re-clusters everything dirtied since v_full — including
    # dirs[1], which a recovery trusting the scoped compact would skip
    assert dirs[1] in rec[0]["result"]["partitions"]
    assert t.read().count() == 480


def test_cluster_on_extracted_string_column(spark, tmp_path):
    """r15: extracted STRING columns carry Iceberg-truncated col_stats
    bounds, so sort-strategy clustering on them is valid — re-layout by
    country turns an interleaved table into range-disjoint files an
    equality predicate prunes. Z-order on strings stays rejected (no
    exact fixed-width normalization)."""
    import json as _json

    from pyspark.sql.datasource import EqualTo

    from zombi_spark.ingest.extraction import FieldSpec, TableSchemaConfig
    from zombi_spark.sources.datasource import ZombiBatchReader

    cfg = TableSchemaConfig(
        payload_format="json",
        fields=[FieldSpec(name="country", json_path="c", data_type="utf8")],
    )
    t = EventTable(spark, str(tmp_path), "bycountry", schema_config=cfg)
    countries = ["AR", "BR", "DE", "IN", "JP", "US"]
    for s in range(3):
        rows = [
            ("t", i % 4, _json.dumps({"c": countries[(i + s) % 6]}).encode(),
             T0 + (i * 977) % 3_600_000, None, s * 200 + i)
            for i in range(200)
        ]
        t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    before = t.read().count()
    us_before = t.read().where("country = 'US'").count()

    def _kept():
        reader = ZombiBatchReader(t.table_schema(), {"path": t.path})
        reader.pushFilters([EqualTo(("country",), "US")])
        reader.partitions()
        return reader.last_plan["files_kept"], reader.last_plan["files_total"]

    # interleaved layout: every file's bounds span AR..US — nothing prunes
    kept, total = _kept()
    assert kept == total
    t.compact(
        strategy="sort",
        sort_columns=["country"],
        rewrite_all=True,
        min_input_files=1,
        target_files_per_partition=6,
    )
    assert t.read().count() == before  # INV-6 across the re-layout
    kept, total = _kept()
    assert 0 < kept < total
    assert t.read().where("country = 'US'").count() == us_before > 0

    # z-order on a string dimension fails fast with the sort hint
    with pytest.raises(ValueError, match="z-order needs numeric"):
        t.compact(
            strategy="zorder",
            sort_columns=["timestamp_ms", "country"],
            rewrite_all=True,
            min_input_files=1,
        )
