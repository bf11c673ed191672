"""The ``zombi`` Spark data source (sources/datasource.py).

Covers the three contracts the format string promises:
  - batch reads are snapshot-consistent, value-identical to the JVM
    parquet path (EventTable.read), time-travelable, and manifest-pruned
    under pushed filters — pruning never changes results;
  - the stream reader delivers appended rows exactly once across
    checkpoint restarts (version offsets, append snapshots only);
  - metadata access is session-free (the data source's Python processes
    have no SparkSession).
"""

import datetime
import json
import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In, IsNotNull, LessThan

from zombi_spark.ingest.batch import RAW_EVENT_SCHEMA, prepare_events
from zombi_spark.ingest.extraction import FieldSpec, TableSchemaConfig
from zombi_spark.sources.datasource import (
    ZombiBatchReader,
    register_zombi_datasource,
)
from zombi_spark.table.event_table import EventTable

T0 = 1704067200000  # 2024-01-01T00:00:00Z


def _batch(spark, start, n, step_ms=600000):
    rows = [
        ("t", i % 2, f"p{i}".encode(), T0 + i * step_ms, None, i)
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(rows, RAW_EVENT_SCHEMA)


@pytest.fixture()
def table(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(prepare_events(_batch(spark, 0, 12)))
    t.append(prepare_events(_batch(spark, 12, 6)))
    register_zombi_datasource(spark)
    return t


def _load(spark, t, **options):
    reader = spark.read.format("zombi")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(t.path)


def test_event_table_metadata_is_session_free(table):
    """The data source constructs EventTable(spark=None) — pin that every
    metadata method it relies on works without a session."""
    t = EventTable(None, os.path.dirname(table.path), "events")
    assert t.latest_version() == 1
    entries = t.scan_files()
    assert entries and all("file_path" in e for e in entries)
    assert t.added_files(0, 1)
    assert [f.name for f in t.table_schema().fields][0] == "sequence"
    assert t.table_metadata()["format_version"] == 2


def test_batch_read_matches_jvm_parquet_path(spark, table):
    df = _load(spark, table)
    base = table.read()
    # names+types equal; nullability differs cosmetically (Spark marks
    # dir-derived partition columns nullable on the JVM parquet path)
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in base.schema.fields
    ]
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, base.collect()))
    assert got == want
    # hive partition columns materialize from the dir layout
    assert df.where(F.col("event_date").isNull() | F.col("event_hour").isNull()).count() == 0


def test_time_travel_option(spark, table):
    assert _load(spark, table, version=0).count() == 12
    assert _load(spark, table, version=1).count() == 18
    with pytest.raises(Exception, match="[Nn]o snapshot|PYTHON_DATA_SOURCE"):
        _load(spark, table, version=9).count()


def test_filtered_reads_are_row_correct(spark, table):
    df = _load(spark, table)
    base = table.read()
    for cond in (
        f"timestamp_ms >= {T0 + 3600_000} and partition = 0",
        "event_hour = 2",
        f"event_date = date'2024-01-01' and sequence < 5",
        "topic = 'missing'",
    ):
        assert sorted(map(tuple, df.filter(cond).collect())) == sorted(
            map(tuple, base.filter(cond).collect())
        ), cond


def test_push_filters_prune_files_by_manifest_bounds(spark, table):
    reader = ZombiBatchReader(table.table_schema(), {"path": table.path})
    total = len(reader.partitions())
    assert reader.last_plan["files_kept"] == reader.last_plan["files_total"] == total

    # ts lower bound past every row -> everything pruned (sentinel remains)
    returned = reader.pushFilters([GreaterThanOrEqual(("timestamp_ms",), T0 + 10**9)])
    # every filter comes back unhandled: Spark re-applies row-level
    assert len(list(returned)) == 1
    parts = reader.partitions()
    assert reader.last_plan["files_kept"] == 0
    assert len(parts) == 1 and parts[0].slices == []

    # hour equality prunes to the files of that hive dir
    reader.pushFilters([EqualTo(("event_hour",), 2)])
    reader.partitions()
    assert 0 < reader.last_plan["files_kept"] < reader.last_plan["files_total"]

    # In() on partition admits, IsNotNull never prunes, unknown col ignored
    reader.pushFilters(
        [In(("partition",), (0, 1)), IsNotNull(("payload",)), LessThan(("nope",), 3)]
    )
    reader.partitions()
    assert reader.last_plan["files_kept"] == reader.last_plan["files_total"]

    # date equality on a different day prunes everything
    reader.pushFilters([EqualTo(("event_date",), datetime.date(2030, 1, 1))])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 0


def test_empty_table_reads_zero_rows(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "empty")
    t.append(prepare_events(_batch(spark, 0, 1)))  # commit once so schema exists
    t.delete_where("sequence >= 0")
    register_zombi_datasource(spark)
    assert _load(spark, t).count() == 0


def test_column_add_evolution_serves_null_through_datasource(spark, tmp_path):
    """Files written before a column-ADD lack the new extracted column;
    the data source fills NULL for them — same rule as the JVM read."""
    v1 = TableSchemaConfig(
        payload_format="json",
        fields=[FieldSpec(name="k", json_path="k", data_type="int64")],
    )
    v2 = TableSchemaConfig(
        payload_format="json",
        fields=[
            FieldSpec(name="k", json_path="k", data_type="int64"),
            FieldSpec(name="label", json_path="label", data_type="utf8"),
        ],
    )
    t1 = EventTable(spark, str(tmp_path), "events", schema_config=v1)
    rows = [("t", 0, json.dumps({"k": i}).encode(), T0 + i * 1000, None, i) for i in range(5)]
    t1.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    t2 = EventTable(spark, str(tmp_path), "events", schema_config=v2)
    rows2 = [
        ("t", 0, json.dumps({"k": i, "label": f"x{i}"}).encode(), T0 + i * 1000, None, i)
        for i in range(5, 8)
    ]
    t2.append(prepare_events(spark.createDataFrame(rows2, RAW_EVENT_SCHEMA)))

    register_zombi_datasource(spark)
    df = _load(spark, t2)
    assert "label" in df.columns and "k" in df.columns
    got = sorted((r["k"], r["label"]) for r in df.collect())
    base = sorted((r["k"], r["label"]) for r in t2.read().collect())
    assert got == base
    assert sum(1 for _, label in got if label is None) == 5


def test_stream_reads_appends_exactly_once(spark, table, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    batches = []

    def run():
        local = []
        q = (
            spark.readStream.format("zombi")
            .load(table.path)
            .writeStream.foreachBatch(lambda df, bid: local.append((bid, df.count())))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        return local

    batches.append(run())
    assert sum(n for _, n in batches[0]) == 18  # default: earliest

    # no new snapshot -> the re-run delivers nothing new
    assert sum(n for _, n in run()) == 0

    table.append(prepare_events(_batch(spark, 18, 4)))
    second = run()
    assert sum(n for _, n in second) == 4  # only the delta

    # compaction must not re-deliver (append snapshots only)
    table.compact(min_input_files=2)
    assert sum(n for _, n in run()) == 0


def test_stream_starting_version_latest(spark, table, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    seen = []
    q = (
        spark.readStream.format("zombi")
        .option("starting_version", "latest")
        .load(table.path)
        .writeStream.foreachBatch(lambda df, bid: seen.append(df.count()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert sum(seen) == 0  # nothing before the stream started counts
    table.append(prepare_events(_batch(spark, 18, 3)))
    seen2 = []
    q2 = (
        spark.readStream.format("zombi")
        .option("starting_version", "latest")
        .load(table.path)
        .writeStream.foreachBatch(lambda df, bid: seen2.append(df.count()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(180)
    assert sum(seen2) == 3


def test_file_slices_row_group_splitting(tmp_path):
    """Large files split into row-group ranges packed to ~max_bytes; the
    slices cover every row exactly once; small files stay whole (padded
    to the open cost); a missing footer degrades to one whole-file
    slice."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zombi_spark.sources.datasource import (
        _OPEN_COST_BYTES,
        ZombiInputPartition,
        _file_slices,
        _read_partition,
    )

    p = str(tmp_path / "big.parquet")
    table = pa.table({"sequence": pa.array(range(1000), pa.int64())})
    pq.write_table(table, p, row_group_size=100)  # 10 row groups
    entry = {"file_path": p, "file_size_bytes": os.path.getsize(p)}

    whole = _file_slices(entry, {}, max_bytes=10**9)
    assert len(whole) == 1 and whole[0][2] is None
    assert whole[0][3] == _OPEN_COST_BYTES  # open-cost padding

    tiny = _file_slices(entry, {}, max_bytes=1)  # every group its own slice
    assert len(tiny) == 10
    assert [g for s in tiny for g in s[2]] == list(range(10))

    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("sequence", T.LongType(), True)])
    seen = []
    for s_ in tiny:
        part = ZombiInputPartition(slices=[s_[:3]])
        for batch in _read_partition(part, schema):
            seen.extend(batch.column(0).to_pylist())
    assert sorted(seen) == list(range(1000))

    broken = _file_slices(
        {"file_path": str(tmp_path / "missing.parquet"), "file_size_bytes": 10**9},
        {},
        max_bytes=1,
    )
    assert len(broken) == 1 and broken[0][2] is None


def test_entry_admits_is_sound_under_fuzzed_bounds():
    """File-skipping soundness (pure-function fuzz, no Spark): for random
    row populations and random pushed constraints, a file whose rows
    contain ANY match must be admitted — pruning may over-admit, never
    over-prune. This is the invariant that makes pushFilters a safe
    optimization at any scale."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zombi_spark.sources.datasource import _entry_admits

    ops = st.sampled_from(["==", ">", ">=", "<", "<="])
    vals = st.integers(min_value=-50, max_value=50)

    def _matches(v, op, x):
        return {
            "==": v == x,
            ">": v > x,
            ">=": v >= x,
            "<": v < x,
            "<=": v <= x,
        }[op]

    @settings(max_examples=300, deadline=None)
    @given(
        rows=st.lists(vals, min_size=1, max_size=20),
        constraints=st.lists(st.tuples(ops, vals), min_size=1, max_size=4),
        with_stats=st.booleans(),
        hour=st.integers(min_value=0, max_value=23),
        hour_ops=st.lists(st.tuples(ops, st.integers(0, 23)), max_size=2),
    )
    def check(rows, constraints, with_stats, hour, hour_ops):
        entry = {"file_path": "x.parquet", "partition_dir": f"event_date=2024-01-01/event_hour={hour}"}
        if with_stats:
            entry["min_ts"] = min(rows)
            entry["max_ts"] = max(rows)
        cons = [("timestamp_ms", op, x) for op, x in constraints] + [
            ("event_hour", op, x) for op, x in hour_ops
        ]
        any_match = any(
            all(_matches(v, op, x) for op, x in constraints)
            and all(_matches(hour, op, x) for op, x in hour_ops)
            for v in rows
        )
        if any_match:
            assert _entry_admits(entry, cons), (rows, cons, entry)

    check()


def test_metadata_tables_files_and_snapshots(spark, table):
    """option("metadata", ...) exposes the manifest as DataFrames — the
    `SELECT * FROM t.files` / `t.snapshots` Iceberg surface (reference
    S11, iceberg_storage.rs:1478-1522)."""
    files = (
        spark.read.format("zombi").option("metadata", "files").load(table.path)
    )
    entries = table.scan_files()
    got = {r["file_path"]: r for r in files.collect()}
    assert set(got) == {e["file_path"] for e in entries}
    assert sum(r["row_count"] for r in got.values()) == 18
    assert all(r["min_ts"] <= r["max_ts"] for r in got.values())

    # as-of: version 0 lists only the first append's files
    files_v0 = (
        spark.read.format("zombi")
        .option("metadata", "files")
        .option("version", 0)
        .load(table.path)
    )
    assert sum(r["row_count"] for r in files_v0.collect()) == 12

    snaps = (
        spark.read.format("zombi").option("metadata", "snapshots").load(table.path)
    )
    rows = {r["version"]: r for r in snaps.collect()}
    assert set(rows) == {0, 1}
    assert rows[1]["parent_version"] == 0
    assert all(r["operation"] == "append" and r["n_added"] > 0 for r in rows.values())

    with pytest.raises(Exception, match="unknown metadata table"):
        spark.read.format("zombi").option("metadata", "nope").load(table.path).count()


def test_stream_max_versions_per_batch_paces_catchup(spark, tmp_path):
    """The catch-up rate limit: with max_versions_per_batch=1, appended
    snapshots arrive one version per micro-batch, never coalesced.

    The FIRST planned batch is deliberately uncapped (latestOffset with
    no observed offset returns the true latest — the ADVICE r13
    exactly-once rule), so pacing is asserted from the versions appended
    AFTER the stream is running."""
    t = EventTable(spark, str(tmp_path), "events")
    t.append(prepare_events(_batch(spark, 0, 5)))
    register_zombi_datasource(spark)
    counts = []
    q = (
        spark.readStream.format("zombi")
        .option("max_versions_per_batch", 1)
        .load(t.path)
        .writeStream.foreachBatch(lambda df, bid: counts.append(df.count()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    deadline = time.time() + 240
    try:
        while sum(counts) < 5 and time.time() < deadline:
            time.sleep(0.5)
        per_version = [3, 4, 2]
        start = 5
        for n in per_version:
            t.append(prepare_events(_batch(spark, start, n)))
            start += n
        while sum(counts) < 5 + sum(per_version) and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    # one version per non-empty batch: the first (uncapped) batch held
    # the only pre-existing version; each appended version is its own
    # batch — the cap forbids coalescing even when appends outpace
    # triggers
    assert [c for c in counts if c > 0] == [5] + per_version


def test_stream_latest_offset_uncapped_until_real_offset_observed(spark, tmp_path):
    """ADVICE r13 (high): a reader whose first call is latestOffset — an
    idle RESTART, where the checkpointed offset is invisible to the
    reader — must return the TRUE latest, not a capped seed. A capped
    seed (earliest=-1 + cap) sits below the committed offset; a
    regressed offset in the engine's offset log replays versions already
    consumed, breaking exactly-once. Once partitions() observes a real
    offset, the cap binds."""
    from zombi_spark.sources.datasource import ZombiStreamReader

    t = EventTable(spark, str(tmp_path), "events")
    for s in (0, 5, 8):
        t.append(prepare_events(_batch(spark, s, 3)))
    reader = ZombiStreamReader(
        t.table_schema(), {"path": t.path, "max_versions_per_batch": "1"}
    )
    # first ask, no offset ever observed: true latest, cap NOT applied
    assert reader.latestOffset() == {"version": 2}
    # engine replans a batch from the checkpoint: the cap binds after
    reader.partitions({"version": -1}, {"version": 0})
    assert reader.latestOffset() == {"version": 1}
    reader.partitions({"version": 0}, {"version": 1})
    assert reader.latestOffset() == {"version": 2}


def test_stream_capped_idle_restart_stays_exactly_once(spark, tmp_path):
    """End-to-end pin of the ADVICE r13 regression scenario: consume a
    multi-version table under max_versions_per_batch, restart the query
    IDLE (no new snapshots) — nothing may be re-delivered — then append
    one version and restart again — only the delta arrives."""
    t = EventTable(spark, str(tmp_path), "events")
    per_version = [5, 3, 4]
    start = 0
    for n in per_version:
        t.append(prepare_events(_batch(spark, start, n)))
        start += n
    register_zombi_datasource(spark)
    ckpt = str(tmp_path / "ckpt")

    def run():
        local = []
        q = (
            spark.readStream.format("zombi")
            .option("max_versions_per_batch", 1)
            .load(t.path)
            .writeStream.foreachBatch(lambda df, bid: local.append(df.count()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        return local

    assert sum(run()) == sum(per_version)
    # idle restart: the buggy capped-seed latestOffset regressed the
    # offset log here and replayed history; fixed = zero new rows
    assert sum(run()) == 0
    t.append(prepare_events(_batch(spark, start, 2)))
    assert sum(run()) == 2
    assert sum(run()) == 0


def test_pack_partitions_invariants_fuzzed(tmp_path):
    """Planning invariants for any (row-group sizes, max_bytes,
    min_partitions): the packed partitions cover every row group of
    every file exactly once, in order; multi-group slices respect
    max_bytes; and multi-slice partitions respect the derived target."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zombi_spark.sources.datasource import _pack_partitions

    p = str(tmp_path / "fuzz.parquet")
    pq.write_table(
        pa.table({"x": pa.array(range(700), pa.int64())}), p, row_group_size=100
    )
    n_groups = pq.ParquetFile(p).metadata.num_row_groups
    sizes = [
        pq.ParquetFile(p).metadata.row_group(i).total_byte_size
        for i in range(n_groups)
    ]
    size = os.path.getsize(p)
    entries = [
        {"file_path": p, "file_size_bytes": size},
        {"file_path": p, "file_size_bytes": size},
    ]

    @settings(max_examples=50, deadline=None)
    @given(
        max_bytes=st.integers(min_value=1, max_value=sum(sizes) * 3),
        min_parts=st.integers(min_value=1, max_value=64),
    )
    def check(max_bytes, min_parts):
        parts = _pack_partitions(entries, max_bytes=max_bytes, min_partitions=min_parts)
        flat = [
            (path, g)
            for part in parts
            for (path, _hive, groups) in part.slices
            for g in (groups if groups is not None else [None])
        ]
        per_file = [None] if size <= max_bytes else list(range(n_groups))
        assert flat == [(p, g) for _ in entries for g in per_file]
        for part in parts:
            for path, _hive, groups in part.slices:
                if groups is not None and len(groups) > 1:
                    assert sum(sizes[g] for g in groups) <= max_bytes

    check()


def test_catalog_addressed_read(spark, tmp_path):
    """option("warehouse") + option("table") resolve the path by NAME
    through the warehouse registry — the catalog surface (S13/S14)
    joined to the format string. Load without registration fails with
    the known-tables list."""
    from zombi_spark.table.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    t = cat.create_table("events")
    t.append(prepare_events(_batch(spark, 0, 6)))
    register_zombi_datasource(spark)
    df = (
        spark.read.format("zombi")
        .option("warehouse", str(tmp_path))
        .option("table", "events")
        .load()
    )
    assert df.count() == 6
    with pytest.raises(Exception, match="not in catalog"):
        (
            spark.read.format("zombi")
            .option("warehouse", str(tmp_path))
            .option("table", "nope")
            .load()
            .count()
        )


def test_physical_plan_reapplies_pushed_filters(spark, table):
    """The physical plan must keep a row-level Filter above the Python
    scan: pushFilters returns every filter unhandled, so manifest
    pruning can never change results. Guards against a future reader
    claiming filters as fully handled."""
    df = _load(spark, table).filter(f"timestamp_ms >= {T0 + 3600_000}")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan and "timestamp_ms" in plan


def test_as_of_ms_timestamp_time_travel(spark, table):
    """option("as_of_ms") resolves the newest snapshot committed at or
    before the wall-clock instant (FOR SYSTEM_TIME AS OF); before the
    first commit it errors rather than serving the latest."""
    snaps = table.snapshots()
    t_v0, t_v1 = snaps[0]["committed_at_ms"], snaps[1]["committed_at_ms"]
    assert table.version_as_of(t_v0) == 0
    assert table.version_as_of(t_v1 + 10_000) == 1
    assert table.version_as_of(t_v0 - 1) is None

    if t_v1 > t_v0:  # commits in the same ms can't be told apart
        assert _load(spark, table, as_of_ms=t_v0).count() == 12
    assert _load(spark, table, as_of_ms=t_v1 + 10_000).count() == 18
    with pytest.raises(Exception, match="at or before"):
        _load(spark, table, as_of_ms=t_v0 - 1).count()
    with pytest.raises(Exception, match="not both"):
        _load(spark, table, as_of_ms=t_v1, version=0).count()


def test_stream_starting_as_of_ms(spark, table, tmp_path):
    """A follower can start 'from yesterday': starting_as_of_ms resolves
    the snapshot frontier at that wall-clock instant and delivers only
    what committed after it."""
    snaps = table.snapshots()
    t_v0 = snaps[0]["committed_at_ms"]
    t_v1 = snaps[1]["committed_at_ms"]
    if t_v1 <= t_v0:
        pytest.skip("both commits landed in the same millisecond")
    seen = []
    q = (
        spark.readStream.format("zombi")
        .option("starting_as_of_ms", t_v0)
        .load(table.path)
        .writeStream.foreachBatch(lambda df, bid: seen.append(df.count()))
        .option("checkpointLocation", str(tmp_path / "asof-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert sum(seen) == 6  # only the second append's rows


def test_planning_scales_with_manifest_only(tmp_path):
    """Scan planning is O(manifest) driver-side work: packing 7200
    synthetic entries (a 10× sf0.1 table) takes well under a second and
    never opens a file (the paths don't exist)."""
    import time

    from zombi_spark.sources.datasource import _entry_admits, _pack_partitions

    entries = [
        {
            "file_path": f"/nonexistent/event_date=2024-01-{1 + i % 28:02d}/"
            f"event_hour={i % 24}/f{i}.parquet",
            "partition_dir": f"event_date=2024-01-{1 + i % 28:02d}/event_hour={i % 24}",
            "file_size_bytes": 200_000,
            "row_count": 1_000,
            "min_ts": T0 + i * 60_000,
            "max_ts": T0 + (i + 1) * 60_000,
        }
        for i in range(7200)
    ]
    t0 = time.perf_counter()
    cons = [("timestamp_ms", ">=", T0 + 7200 * 30_000)]
    kept = [e for e in entries if _entry_admits(e, cons)]
    parts = _pack_partitions(kept, 128 * 1024 * 1024, 32)
    elapsed = time.perf_counter() - t0
    # 3601: entry 3599's max_ts equals the cutoff — bounds ADMIT it
    assert len(kept) == 3601 and len(parts) >= 32
    assert elapsed < 1.0, f"planning 7200 entries took {elapsed:.2f}s"


def test_batch_time_travel_across_compaction(spark, table):
    """A version read through the data source keeps serving the
    pre-compact snapshot's files (physical deletion is deferred to
    snapshot expiration) — same contract as EventTable.read."""
    pre = sorted(map(tuple, _load(spark, table, version=1).collect()))
    table.compact(min_input_files=2)
    assert sorted(map(tuple, _load(spark, table, version=1).collect())) == pre
    assert _load(spark, table).count() == 18


# ---------------------------------------------------------------- fields
# option("fields", ...) — manual column projection (VERDICT r13 #1): the
# Python DataSource API has no column-pruning hook, so the declared
# schema is the ONLY thing that narrows what executors read.


def test_fields_projection_schema_and_values(spark, table):
    df = _load(spark, table, fields="sequence,timestamp_ms")
    assert [f.name for f in df.schema.fields] == ["sequence", "timestamp_ms"]
    got = sorted(map(tuple, df.collect()))
    want = sorted(
        map(tuple, table.read().select("sequence", "timestamp_ms").collect())
    )
    assert got == want
    # hive partition columns are projectable too (synthesized from the
    # directory layout, still without touching payload)
    df2 = _load(spark, table, fields="event_date,sequence")
    assert [f.name for f in df2.schema.fields] == ["event_date", "sequence"]
    assert df2.where(F.col("event_date").isNull()).count() == 0
    assert df2.count() == 18


def test_fields_projection_validation(spark, table):
    with pytest.raises(Exception, match="unknown field"):
        _load(spark, table, fields="sequence,nope").count()
    with pytest.raises(Exception, match="does not apply to metadata"):
        _load(spark, table, metadata="files", fields="file_path").count()
    # duplicates collapse instead of producing ambiguous columns
    assert [
        f.name for f in _load(spark, table, fields="sequence,sequence").schema.fields
    ] == ["sequence"]


def test_fields_projection_never_reads_payload(table, monkeypatch):
    """The projection contract at the byte level: a projected
    _read_partition asks parquet for EXACTLY the projected physical
    columns — payload's column chunks are never requested. (Spied
    in-process on pyarrow's iter_batches; the executor path runs this
    same function.)"""
    import pyarrow.parquet as pq

    from zombi_spark.sources.datasource import (
        ZombiInputPartition,
        _read_partition,
        table_schema_for,
    )

    full = table_schema_for(table.path)
    projected = type(full)([f for f in full.fields if f.name in ("sequence", "timestamp_ms")])
    entries = table.scan_files()
    part = ZombiInputPartition(
        slices=[(e["file_path"], {}, None) for e in entries]
    )
    asked: list = []
    real_pf = pq.ParquetFile

    class SpyParquetFile(real_pf):
        def iter_batches(self, *args, **kwargs):
            asked.append(kwargs.get("columns"))
            return super().iter_batches(*args, **kwargs)

    monkeypatch.setattr(pq, "ParquetFile", SpyParquetFile)
    batches = list(_read_partition(part, projected))
    assert asked and all(cols == ["sequence", "timestamp_ms"] for cols in asked)
    assert sum(b.num_rows for b in batches) == 18
    assert all(b.schema.names == ["sequence", "timestamp_ms"] for b in batches)


def test_sql_view_reads_the_format(spark, table):
    """S15 from pure SQL (SURVEY §2.1 'any engine reads the table'):
    register_zombi_view binds the format's options into a temp view any
    spark.sql query can read — projection (fields), time travel, and
    row-correct filters included. (A CREATE TABLE ... USING zombi table
    cannot work: PySpark 4.1 hands the Python data source an EMPTY
    options dict at scan planning, so the helper + view is the SQL
    surface — see register_zombi_view's docstring.)"""
    from zombi_spark.sources.datasource import register_zombi_view

    register_zombi_view(
        spark, "zombi_sql_events", table.path, fields="sequence,timestamp_ms,event_hour"
    )
    try:
        got = sorted(
            map(
                tuple,
                spark.sql(
                    "SELECT sequence, timestamp_ms, event_hour "
                    "FROM zombi_sql_events WHERE event_hour >= 1"
                ).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                table.read()
                .where("event_hour >= 1")
                .select("sequence", "timestamp_ms", "event_hour")
                .collect(),
            )
        )
        assert got == want and got
        # time travel through a view, SQL-side aggregation
        register_zombi_view(spark, "zombi_sql_v0", table.path, version=0)
        assert spark.sql("SELECT count(*) AS n FROM zombi_sql_v0").first()["n"] == 12
    finally:
        spark.catalog.dropTempView("zombi_sql_events")
        spark.catalog.dropTempView("zombi_sql_v0")


def test_fields_projection_applies_to_stream_reads(spark, table, tmp_path):
    """One shared schema(): option("fields") narrows readStream exactly
    as it narrows batch reads."""
    seen: list = []
    q = (
        spark.readStream.format("zombi")
        .option("fields", "sequence,partition")
        .load(table.path)
        .writeStream.foreachBatch(
            lambda df, bid: seen.append((df.columns, df.count()))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt-fields"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert sum(n for _, n in seen) == 18
    assert all(cols == ["sequence", "partition"] for cols, _ in seen)


def test_fields_projection_parity_across_subsets(spark, table):
    """Projection must never change values, only columns: for assorted
    subsets (reversed order, hive-only, payload-only, binary+date mix),
    the projected read equals the full read's select, column order as
    requested."""
    full = table.read()
    for fields in (
        "timestamp_ms,sequence",               # reversed vs table order
        "event_hour,event_date",               # hive columns only
        "payload",                             # the binary column alone
        "idempotency_key,payload,event_date",  # nullable + binary + date
        "topic,partition,sequence,timestamp_ms,payload,event_date,event_hour,idempotency_key",
    ):
        names = fields.split(",")
        df = _load(spark, table, fields=fields)
        assert [f.name for f in df.schema.fields] == names, fields
        got = sorted(map(tuple, df.collect()))
        want = sorted(map(tuple, full.select(*names).collect()))
        assert got == want, fields


def test_fields_projection_with_column_add_evolution(spark, tmp_path):
    """Projecting an ADDed column: files written before the column
    existed serve NULL through the projected read, same rule as full
    reads."""
    v1 = TableSchemaConfig(
        payload_format="json",
        fields=[FieldSpec(name="k", json_path="k", data_type="int64")],
    )
    v2 = TableSchemaConfig(
        payload_format="json",
        fields=[
            FieldSpec(name="k", json_path="k", data_type="int64"),
            FieldSpec(name="label", json_path="label", data_type="utf8"),
        ],
    )
    t1 = EventTable(spark, str(tmp_path), "events", schema_config=v1)
    rows = [("t", 0, json.dumps({"k": i}).encode(), T0 + i * 1000, None, i) for i in range(4)]
    t1.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    t2 = EventTable(spark, str(tmp_path), "events", schema_config=v2)
    rows2 = [
        ("t", 0, json.dumps({"k": i, "label": f"x{i}"}).encode(), T0 + i * 1000, None, i)
        for i in range(4, 6)
    ]
    t2.append(prepare_events(spark.createDataFrame(rows2, RAW_EVENT_SCHEMA)))
    register_zombi_datasource(spark)
    got = sorted(
        (r["k"], r["label"])
        for r in _load(spark, t2, fields="k,label").collect()
    )
    assert got == sorted(
        (r["k"], r["label"]) for r in t2.read().select("k", "label").collect()
    )
    assert sum(1 for _, label in got if label is None) == 4


def test_sql_view_by_catalog_name(spark, table, tmp_path):
    """register_zombi_view resolves warehouse+table options (no path):
    the catalog registry names the table, the view serves its rows."""
    from zombi_spark.sources.datasource import register_zombi_view
    from zombi_spark.table.catalog import Catalog

    root = os.path.dirname(table.path)
    Catalog(spark, root).register("events")
    try:
        register_zombi_view(
            spark, "zombi_cat_v", warehouse=root, table="events",
            fields="sequence,partition",
        )
        assert spark.sql("SELECT count(*) AS n FROM zombi_cat_v").first()["n"] == 18
    finally:
        spark.catalog.dropTempView("zombi_cat_v")


def test_lagging_consumer_past_expiry_gets_retention_error(spark, tmp_path):
    """A consumer whose offset predates expire_snapshots must get the
    retention contract spelled out, not a FileNotFoundError that reads
    like corruption (module docstring: size the retention window to
    exceed the slowest consumer's lag)."""
    t = EventTable(spark, str(tmp_path), "events")
    for s in range(5):
        t.append(prepare_events(_batch(spark, s * 3, 3)))
    t.expire_snapshots(keep_last=2)
    with pytest.raises(ValueError, match="expired.*retention|retention.*expired"):
        t.added_files(0, t.latest_version())
    # a live offset still reads fine
    assert t.added_files(t.latest_version() - 1, t.latest_version())


def test_extracted_column_bounds_prune_files(spark, tmp_path):
    """r14: extraction tables record per-file ``col_stats`` bounds for
    extracted INTEGER columns (both writer paths), and the data source's
    pushed filters prune on them — the same Iceberg lower/upper-bound
    contract the system columns get. Pruning stays an optimization:
    results equal the JVM read under every predicate."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from zombi_spark.table.event_table import _parquet_file_entry

    cfg = TableSchemaConfig(
        payload_format="json",
        fields=[FieldSpec(name="k", json_path="k", data_type="int64")],
    )
    t = EventTable(spark, str(tmp_path), "events", schema_config=cfg)
    # three appends with DISJOINT k ranges inside one hour: file bounds
    # on k are the only thing that can tell the files apart
    for base in (0, 1000, 2000):
        rows = [
            ("t", 0, json.dumps({"k": base + i}).encode(), T0 + i, None, base + i)
            for i in range(20)
        ]
        t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))

    entries = t.scan_files()
    assert all("col_stats" in e and "k" in e["col_stats"] for e in entries)
    # manifest bounds equal a fresh footer read on every file — BOTH
    # writer paths produce the same col_stats contract
    for e in entries:
        refetched = _parquet_file_entry(e["file_path"], t.data_path)
        assert e["col_stats"] == refetched.get("col_stats"), e["file_path"]

    register_zombi_datasource(spark)
    reader = ZombiBatchReader(t.table_schema(), {"path": t.path})
    reader.pushFilters([GreaterThan(("k",), 1500)])
    reader.partitions()
    assert 0 < reader.last_plan["files_kept"] < reader.last_plan["files_total"]
    reader.pushFilters([EqualTo(("k",), 1005)])
    reader.partitions()
    assert reader.last_plan["files_kept"] < reader.last_plan["files_total"]
    # value outside every file's range prunes everything
    reader.pushFilters([EqualTo(("k",), 10**9)])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 0

    # pruning never gates correctness: rows match the JVM path (column
    # order normalized — the declared extraction schema orders columns
    # differently than the JVM parquet read; values are the contract)
    df = _load(spark, t)
    base_df = t.read()
    cols = sorted(df.columns)
    assert cols == sorted(base_df.columns)
    for cond in ("k > 1500", "k = 1005", "k = 999999999", "k < 0"):
        assert sorted(map(tuple, df.filter(cond).select(*cols).collect())) == sorted(
            map(tuple, base_df.filter(cond).select(*cols).collect())
        ), cond


def test_extracted_column_bounds_absent_for_all_null(spark, tmp_path):
    """A file whose extracted column is entirely NULL records no bounds
    for it (absent ⇒ never skipped), and a filter on it keeps the file —
    stats are an optimization, never a correctness gate."""
    from pyspark.sql.datasource import EqualTo

    cfg = TableSchemaConfig(
        payload_format="json",
        fields=[FieldSpec(name="k", json_path="k", data_type="int64")],
    )
    t = EventTable(spark, str(tmp_path), "events", schema_config=cfg)
    rows = [("t", 0, b"{}", T0 + i, None, i) for i in range(10)]
    t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    entries = t.scan_files()
    assert all("k" not in (e.get("col_stats") or {}) for e in entries)
    register_zombi_datasource(spark)
    reader = ZombiBatchReader(t.table_schema(), {"path": t.path})
    reader.pushFilters([EqualTo(("k",), 7)])
    reader.partitions()
    assert reader.last_plan["files_kept"] == reader.last_plan["files_total"]
    assert _load(spark, t).where("k = 7").count() == 0
    assert _load(spark, t).where("k IS NULL").count() == 10


def test_entry_admits_is_sound_for_extracted_col_stats():
    """The r14 col_stats pruning path carries the same soundness
    invariant as the system bound columns (pure-function fuzz): for
    random non-null value populations of an extracted column and random
    pushed constraints on it, a file containing ANY matching row is
    always admitted — including entries with partial/no stats and
    constraints mixing system and extracted columns."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zombi_spark.sources.datasource import _entry_admits

    ops = st.sampled_from(["==", ">", ">=", "<", "<="])
    vals = st.integers(min_value=-50, max_value=50)

    def _matches(v, op, x):
        return {
            "==": v == x,
            ">": v > x,
            ">=": v >= x,
            "<": v < x,
            "<=": v <= x,
        }[op]

    @settings(max_examples=300, deadline=None)
    @given(
        k_rows=st.lists(vals, min_size=1, max_size=20),
        ts_rows=st.lists(vals, min_size=1, max_size=20),
        k_cons=st.lists(st.tuples(ops, vals), min_size=1, max_size=3),
        ts_cons=st.lists(st.tuples(ops, vals), max_size=2),
        with_k_stats=st.booleans(),
        with_ts_stats=st.booleans(),
    )
    def check(k_rows, ts_rows, k_cons, ts_cons, with_k_stats, with_ts_stats):
        # rows pair the i-th k with the i-th ts (cycled) — one file
        n = max(len(k_rows), len(ts_rows))
        rows = [(k_rows[i % len(k_rows)], ts_rows[i % len(ts_rows)]) for i in range(n)]
        entry = {"file_path": "x.parquet"}
        if with_k_stats:
            entry["col_stats"] = {"k": [min(k_rows), max(k_rows)]}
        if with_ts_stats:
            entry["min_ts"] = min(ts_rows)
            entry["max_ts"] = max(ts_rows)
        cons = [("k", op, x) for op, x in k_cons] + [
            ("timestamp_ms", op, x) for op, x in ts_cons
        ]
        any_match = any(
            all(_matches(k, op, x) for op, x in k_cons)
            and all(_matches(ts, op, x) for op, x in ts_cons)
            for k, ts in rows
        )
        if any_match:
            assert _entry_admits(entry, cons), (rows, cons, entry)

    check()


# --------------------------------------------------------------- r15 bounds
def test_string_truncation_helpers():
    """Iceberg string-bound truncation semantics (UnicodeUtil): prefix
    lower, incremented upper, carry past U+10FFFF, surrogate-range skip,
    all-max ⇒ no upper bound."""
    from zombi_spark.table.event_table import (
        increment_string,
        truncate_lower_bound,
        truncate_upper_bound,
    )

    # short values pass through exactly
    assert truncate_lower_bound("hello") == "hello"
    assert truncate_upper_bound("hello") == "hello"
    # 16-cp truncation; upper increments the LAST kept code point
    long = "hello world extra chars"
    assert truncate_lower_bound(long) == "hello world extr"
    assert truncate_upper_bound(long) == "hello world exts"
    # the bounds bracket the value
    assert truncate_lower_bound(long) <= long < truncate_upper_bound(long)
    # carry: a trailing U+10FFFF drops and increments the previous cp
    s = "ab" + chr(0x10FFFF) * 15
    up = truncate_upper_bound(s)
    assert up == "ac" and up > s[:16]
    # all-max prefix: no sound upper bound exists
    assert truncate_upper_bound(chr(0x10FFFF) * 17) is None
    assert increment_string(chr(0x10FFFF) * 3) is None
    # surrogate range is skipped, bound stays valid UTF-8
    t = ("x" * 15 + chr(0xD7FF)) + "tail"
    up = truncate_upper_bound(t)
    assert up == "x" * 15 + chr(0xE000) and up > t
    up.encode("utf-8")  # must not raise
    # unicode: multi-byte code points count as ONE position
    u = "né" * 10
    assert len(truncate_lower_bound(u)) == 16
    assert truncate_upper_bound(u) > u[:16]


def test_extracted_string_bounds_prune_files(spark, tmp_path):
    """r15: extraction tables record Iceberg-truncated per-file string
    bounds; `WHERE country = 'US'` plans exactly 1 of N range-disjoint
    files, prefix pushdown (LIKE 'xx%') prunes too, and results equal
    the JVM read under every predicate."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, StringStartsWith

    from zombi_spark.table.event_table import _parquet_file_entry

    cfg = TableSchemaConfig(
        payload_format="json",
        fields=[FieldSpec(name="country", json_path="country", data_type="utf8")],
    )
    t = EventTable(spark, str(tmp_path), "events", schema_config=cfg)
    # 4 appends with DISJOINT country values inside one hour; "ZZ..." is
    # >16 cp so its bounds exercise truncation on the real write path
    countries = ["AR", "BR", "US", "ZZ" + "z" * 20]
    for ci, c in enumerate(countries):
        rows = [
            ("t", 0, json.dumps({"country": c}).encode(), T0 + i, None, ci * 100 + i)
            for i in range(15)
        ]
        t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    entries = t.scan_files()
    assert all("country" in (e.get("col_stats") or {}) for e in entries)
    # bounds are ≤16 code points and bracket the values; BOTH writer
    # paths produce the same manifest contract as a fresh footer read
    for e in entries:
        lo, hi = e["col_stats"]["country"]
        assert len(lo) <= 16 and (hi is None or len(hi) <= 16)
        refetched = _parquet_file_entry(e["file_path"], t.data_path)
        assert e["col_stats"] == refetched.get("col_stats"), e["file_path"]
    long_entry = [e for e in entries if e["col_stats"]["country"][0].startswith("ZZ")]
    assert long_entry[0]["col_stats"]["country"] == ["ZZ" + "z" * 14, "ZZ" + "z" * 13 + "{"]

    register_zombi_datasource(spark)
    reader = ZombiBatchReader(t.table_schema(), {"path": t.path})
    # THE planning pin: an equality on the categorical extracted column
    # plans exactly 1 of 4 files
    reader.pushFilters([EqualTo(("country",), "US")])
    reader.partitions()
    assert (reader.last_plan["files_kept"], reader.last_plan["files_total"]) == (1, 4)
    # prefix pushdown (LIKE 'ZZ%') keeps only the long-value file
    reader.pushFilters([StringStartsWith(("country",), "ZZ")])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 1
    # range prunes; a value past every bound prunes everything
    reader.pushFilters([GreaterThan(("country",), "BR")])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 2
    reader.pushFilters([EqualTo(("country",), "zzzz")])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 0
    # equality INSIDE a truncated range keeps the file (prefix-ambiguous)
    reader.pushFilters([EqualTo(("country",), "ZZ" + "z" * 14 + "a")])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 1

    # the files metadata table exposes the bounds for SQL inspection
    meta = (
        spark.read.format("zombi").option("metadata", "files").load(t.path).collect()
    )
    assert all(r["col_stats"] and "country" in json.loads(r["col_stats"]) for r in meta)

    # pruning never gates correctness: rows match the JVM path
    df = _load(spark, t)
    base_df = t.read()
    cols = sorted(df.columns)
    for cond in (
        "country = 'US'",
        "country LIKE 'ZZ%'",
        "country > 'BR'",
        "country = 'zzzz'",
        f"country = '{'ZZ' + 'z' * 20}'",
    ):
        assert sorted(map(tuple, df.filter(cond).select(*cols).collect())) == sorted(
            map(tuple, base_df.filter(cond).select(*cols).collect())
        ), cond


def test_extracted_float_bool_bounds_nan_guard(spark, tmp_path):
    """r15: float extracted columns carry exact [lo, hi] bounds ONLY for
    NaN-free files (Spark orders NaN above +inf and matches NaN = NaN,
    so a finite upper bound on a NaN-carrying file would wrongly prune
    `x > huge`); booleans carry trivial bounds. Both writer paths."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    cfg = TableSchemaConfig(
        payload_format="json",
        fields=[
            FieldSpec(name="score", json_path="score", data_type="float64"),
            FieldSpec(name="flag", json_path="flag", data_type="boolean"),
        ],
    )
    t = EventTable(spark, str(tmp_path), "events", schema_config=cfg)
    # clean ranges [0,9] and [100,109]; third file NaN-poisoned (JSON
    # string "NaN" -> cast to double NaN on the extraction path); vary
    # keys so both the Arrow (unkeyed) and parquet-mr (keyed) writers run
    for base, nan_at, keyed in ((0, None, False), (100, None, True), (200, 3, False)):
        rows = [
            (
                "t",
                0,
                json.dumps(
                    {"score": "NaN" if i == nan_at else base + i, "flag": base == 0}
                ).encode(),
                T0 + i,
                f"k{base + i}" if keyed else None,
                base + i,
            )
            for i in range(10)
        ]
        t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    assert t.read().where("isnan(score)").count() == 1
    entries = t.scan_files()
    assert len(entries) == 3
    # the NaN-poisoned file still records bounds — over the non-NaN
    # values (203 was the NaN slot) — plus its exact NaN count; the
    # planner restricts those bounds to the NaN-sound operators
    by_score = {tuple((e.get("col_stats") or {}).get("score", ())) for e in entries}
    assert by_score == {(0.0, 9.0), (100.0, 109.0), (200.0, 209.0)}
    nans_of = {
        tuple(e["col_stats"]["score"]): (e.get("col_nans") or {}).get("score")
        for e in entries
    }
    assert nans_of == {(0.0, 9.0): 0, (100.0, 109.0): 0, (200.0, 209.0): 1}
    flag_of = {
        tuple(e["col_stats"]["score"]): (e.get("col_stats") or {}).get("flag")
        for e in entries
    }
    assert flag_of[(0.0, 9.0)] == [True, True]
    assert flag_of[(100.0, 109.0)] == [False, False]

    register_zombi_datasource(spark)
    reader = ZombiBatchReader(t.table_schema(), {"path": t.path})
    # `score > 1e9` must NOT prune the NaN file (its NaN row matches in
    # Spark, which orders NaN above +inf) — the clean files both prune
    reader.pushFilters([GreaterThan(("score",), 1e9)])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 1
    # but the NaN-SOUND operators prune it: == 105 excludes [200, 209]
    # (a NaN row can never equal a non-NaN literal)
    reader.pushFilters([EqualTo(("score",), 105.0)])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 1  # clean file 2 only
    reader.pushFilters([EqualTo(("flag",), True)])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 1  # only the base=0 file

    # The Arrow writer suppressed footer stats for the NaN-carrying
    # double column (parquet-cpp would write NaN-ignoring min/max that
    # Spark's JVM scan row-group-prunes on, returning WRONG rows for
    # `x > huge`; parquet-mr drops such stats itself) — so the JVM read
    # below is correct WITH pushdown on, and both paths agree.
    import pyarrow.parquet as pq

    nan_entry = next(
        e for e in entries if (e.get("col_nans") or {}).get("score")
    )
    md = pq.ParquetFile(nan_entry["file_path"]).metadata
    si = {md.schema.column(i).name: i for i in range(md.num_columns)}["score"]
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(si).statistics
        assert st is None or not st.has_min_max

    df = _load(spark, t)
    base_df = t.read()
    cols = sorted(df.columns)

    def canon(frame, cond):
        # stringified rows: Python's nan != nan would fail tuple
        # equality on the very row this test is about
        return sorted(
            tuple(map(str, r)) for r in frame.filter(cond).select(*cols).collect()
        )

    for cond in (
        "score > 1e9",          # only the NaN row (NaN > everything)
        "score = cast('NaN' as double)",
        "score = 105.0",
        "score <= 0.0",
        "flag = true",
    ):
        assert canon(df, cond) == canon(base_df, cond), cond
    assert df.where("score > 1e9").count() == 1
    assert base_df.where("score > 1e9").count() == 1  # JVM path, pushdown ON


def test_entry_admits_is_sound_for_string_col_stats():
    """Pruning-soundness fuzz for TRUNCATED string bounds: random string
    populations, bounds built exactly the way the writers build them
    (truncate(width) lower / truncate+increment upper, possibly
    one-sided), random =, <, >=, startswith constraints — a file
    containing ANY matching row is always admitted."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zombi_spark.sources.datasource import _entry_admits
    from zombi_spark.table.event_table import (
        truncate_lower_bound,
        truncate_upper_bound,
    )

    # small alphabet INCLUDING the max code point so increment-overflow
    # and carry paths get exercised at width=3
    alpha = st.text(
        alphabet=["a", "b", "é", chr(0xD7FF), chr(0x10FFFF)], min_size=0, max_size=6
    )
    ops = st.sampled_from(["==", ">", ">=", "<", "<=", "startswith", "in"])

    def _matches(v, op, x):
        if op == "startswith":
            return v.startswith(x)
        if op == "in":
            return v in x
        return {
            "==": v == x,
            ">": v > x,
            ">=": v >= x,
            "<": v < x,
            "<=": v <= x,
        }[op]

    @settings(max_examples=400, deadline=None)
    @given(
        rows=st.lists(alpha, min_size=1, max_size=12),
        cons=st.lists(
            st.tuples(ops, alpha, st.lists(alpha, min_size=1, max_size=3)),
            min_size=1,
            max_size=3,
        ),
        width=st.integers(min_value=1, max_value=4),
        with_stats=st.booleans(),
    )
    def check(rows, cons, width, with_stats):
        entry = {"file_path": "x.parquet"}
        if with_stats:
            entry["col_stats"] = {
                "c": [
                    truncate_lower_bound(min(rows), width),
                    truncate_upper_bound(max(rows), width),
                ]
            }
        cons = [(op, vals if op == "in" else x) for op, x, vals in cons]
        constraints = [("c", op, x) for op, x in cons]
        any_match = any(all(_matches(v, op, x) for op, x in cons) for v in rows)
        if any_match:
            assert _entry_admits(entry, constraints), (rows, constraints, entry)

    check()


def test_entry_admits_is_sound_for_float_col_stats():
    """Pruning-soundness fuzz for float bounds under Spark's NaN/-0.0
    semantics: NaN orders ABOVE +inf and NaN = NaN matches; -0.0 equals
    0.0. Entries are built the writers' way (bounds over the non-NaN
    values + an exact col_nans count; the planner must keep poisoned
    files for >/>=), match evaluation uses Spark semantics — any
    matching row ⇒ admitted."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zombi_spark.sources.datasource import _entry_admits

    # directed pin first: an In() carrying a NaN literal can match NaN
    # rows (Spark: NaN = NaN), so it must never prune — even a file
    # whose finite bounds exclude everything else
    poisoned = {
        "file_path": "x",
        "row_count": 2,
        "col_stats": {"s": [1.0, 5.0]},
        "col_nans": {"s": 1},
    }
    assert _entry_admits(poisoned, [("s", "in", [float("nan")])])
    assert _entry_admits(poisoned, [("s", ">", 1e9)])  # NaN > everything
    assert not _entry_admits(poisoned, [("s", "==", 9.0)])  # NaN-sound op

    vals = st.sampled_from(
        [0.0, -0.0, 1.5, -2.5, 1e300, -1e300, float("inf"), float("-inf"), float("nan")]
    )
    ops = st.sampled_from(["==", ">", ">=", "<", "<="])

    def _cmp(v, x):
        # Spark total order for the comparison operators: NaN above all
        if math.isnan(v) and math.isnan(x):
            return 0
        if math.isnan(v):
            return 1
        if math.isnan(x):
            return -1
        return (v > x) - (v < x)  # -0.0 == 0.0 here, matching Spark

    def _matches(v, op, x):
        c = _cmp(v, x)
        return {"==": c == 0, ">": c > 0, ">=": c >= 0, "<": c < 0, "<=": c <= 0}[op]

    @settings(max_examples=400, deadline=None)
    @given(
        rows=st.lists(vals, min_size=1, max_size=12),
        cons=st.lists(st.tuples(ops, vals), min_size=1, max_size=3),
        with_stats=st.booleans(),
        with_nans=st.booleans(),
    )
    def check(rows, cons, with_stats, with_nans):
        entry = {"file_path": "x.parquet", "row_count": len(rows)}
        finite = [v for v in rows if not math.isnan(v)]
        if with_stats and finite:
            entry["col_stats"] = {"s": [min(finite), max(finite)]}
        if with_nans:
            entry["col_nans"] = {"s": sum(1 for v in rows if math.isnan(v))}
        constraints = [("s", op, x) for op, x in cons]
        any_match = any(all(_matches(v, op, x) for op, x in cons) for v in rows)
        if any_match:
            assert _entry_admits(entry, constraints), (rows, constraints, entry)

    check()


def test_extracted_string_in_list_and_evolution(spark, tmp_path):
    """IN-list pushdown on an extracted string column, and column-ADD
    evolution: files written BEFORE the string column existed carry no
    bounds for it (never skipped), serve NULL for the column, and a
    predicate on it still returns exactly the JVM-read rows."""
    from pyspark.sql.datasource import In

    v1 = TableSchemaConfig(
        payload_format="json",
        fields=[FieldSpec(name="k", json_path="k", data_type="int64")],
    )
    t1 = EventTable(spark, str(tmp_path), "events", schema_config=v1)
    rows = [("t", 0, json.dumps({"k": i}).encode(), T0 + i, None, i) for i in range(10)]
    t1.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))

    # evolve: add the string column, then append per-country batches
    v2 = TableSchemaConfig(
        payload_format="json",
        fields=[
            FieldSpec(name="k", json_path="k", data_type="int64"),
            FieldSpec(name="country", json_path="c", data_type="utf8"),
        ],
    )
    t = EventTable(spark, str(tmp_path), "events", schema_config=v2)
    for ci, c in enumerate(["AR", "BR", "US"]):
        rows = [
            ("t", 0, json.dumps({"k": 100 + ci * 10 + i, "c": c}).encode(),
             T0 + i, None, 100 + ci * 10 + i)
            for i in range(5)
        ]
        t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))

    entries = t.scan_files()
    pre = [e for e in entries if "country" not in (e.get("col_stats") or {})]
    assert len(pre) == 1  # only the pre-evolution file lacks bounds

    register_zombi_datasource(spark)
    reader = ZombiBatchReader(t.table_schema(), {"path": t.path})
    reader.pushFilters([In(("country",), ("AR", "US"))])
    reader.partitions()
    # 2 bounded matches + the boundless pre-evolution file stay; BR goes
    assert (reader.last_plan["files_kept"], reader.last_plan["files_total"]) == (3, 4)

    df = _load(spark, t)
    base_df = t.read()
    cols = sorted(df.columns)
    for cond in (
        "country IN ('AR', 'US')",
        "country IS NULL",
        "country = 'BR'",
    ):
        assert sorted(map(tuple, df.filter(cond).select(*cols).collect())) == sorted(
            map(tuple, base_df.filter(cond).select(*cols).collect())
        ), cond
    assert df.where("country IS NULL").count() == 10


def test_null_count_skipping_is_null_and_not_null(spark, tmp_path):
    """r15 col_nulls: IS NULL skips files proven all-valued, IS NOT NULL
    skips files proven all-null (Iceberg null_value_counts semantics),
    on BOTH writer paths — and results equal the JVM read."""
    from pyspark.sql.datasource import IsNotNull, IsNull

    cfg = TableSchemaConfig(
        payload_format="json",
        fields=[FieldSpec(name="country", json_path="c", data_type="utf8")],
    )
    t = EventTable(spark, str(tmp_path), "events", schema_config=cfg)
    # file A: country always set (unkeyed → Arrow writer)
    # file B: country entirely absent (keyed → parquet-mr writer)
    # file C: mixed nulls
    for base, payloads, keyed in (
        (0, [{"c": "US"}] * 8, False),
        (100, [{}] * 8, True),
        (200, [{"c": "AR"}, {}] * 4, False),
    ):
        rows = [
            ("t", 0, json.dumps(p).encode(), T0 + i,
             f"k{base + i}" if keyed else None, base + i)
            for i, p in enumerate(payloads)
        ]
        t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    entries = t.scan_files()
    assert len(entries) == 3
    nulls = sorted((e.get("col_nulls") or {}).get("country") for e in entries)
    assert nulls == [0, 4, 8]

    register_zombi_datasource(spark)
    reader = ZombiBatchReader(t.table_schema(), {"path": t.path})
    reader.pushFilters([IsNull(("country",))])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 2  # the all-valued file skips
    reader.pushFilters([IsNotNull(("country",))])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 2  # the all-null file skips
    # col <=> NULL is IS NULL
    from pyspark.sql.datasource import EqualNullSafe

    reader.pushFilters([EqualNullSafe(("country",), None)])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 2
    # hive dir columns are never null for committed rows
    reader.pushFilters([IsNull(("event_date",))])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 0

    df = _load(spark, t)
    base_df = t.read()
    cols = sorted(df.columns)

    def canon(frame, cond):
        # stringify: NULL country values make raw tuples unorderable
        return sorted(
            tuple(map(str, r)) for r in frame.filter(cond).select(*cols).collect()
        )

    for cond in ("country IS NULL", "country IS NOT NULL", "event_date IS NULL"):
        assert canon(df, cond) == canon(base_df, cond), cond
    assert df.where("country IS NULL").count() == 12


def test_entry_admits_is_sound_for_null_count_skipping():
    """Soundness fuzz for the r15 isnull/notnull skipping: random
    populations WITH nulls, entries built the writers' way (col_stats
    over non-null values, col_nulls exact), constraints mixing
    comparisons with IS NULL / IS NOT NULL — any matching row ⇒
    admitted."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zombi_spark.sources.datasource import _entry_admits

    vals = st.one_of(st.none(), st.integers(min_value=-20, max_value=20))
    ops = st.sampled_from(["==", ">", "<", "isnull", "notnull"])

    def _matches(v, op, x):
        if op == "isnull":
            return v is None
        if op == "notnull":
            return v is not None
        if v is None:
            return False
        return {"==": v == x, ">": v > x, "<": v < x}[op]

    @settings(max_examples=400, deadline=None)
    @given(
        rows=st.lists(vals, min_size=1, max_size=15),
        cons=st.lists(st.tuples(ops, st.integers(-20, 20)), min_size=1, max_size=3),
        with_stats=st.booleans(),
        with_nulls=st.booleans(),
    )
    def check(rows, cons, with_stats, with_nulls):
        entry = {"file_path": "x.parquet", "row_count": len(rows)}
        present = [v for v in rows if v is not None]
        if with_stats and present:
            entry["col_stats"] = {"k": [min(present), max(present)]}
        if with_nulls:
            entry["col_nulls"] = {"k": sum(1 for v in rows if v is None)}
        constraints = [("k", op, x) for op, x in cons]
        any_match = any(all(_matches(v, op, x) for op, x in cons) for v in rows)
        if any_match:
            assert _entry_admits(entry, constraints), (rows, constraints, entry)

    check()


def test_promoted_int_column_bounds_prune_and_read_parity(spark, tmp_path):
    """r15 type widening through the format: pre-promotion files carry
    int col_stats, post-promotion files long — one pushed predicate
    prunes on both, and the Arrow read path serves the INT32 files under
    the widened LONG declared schema (per-batch cast)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    narrow = TableSchemaConfig(
        payload_format="json",
        fields=[FieldSpec(name="n", json_path="n", data_type="int32")],
    )
    wide = TableSchemaConfig(
        payload_format="json",
        fields=[FieldSpec(name="n", json_path="n", data_type="int64")],
    )
    t = EventTable(spark, str(tmp_path), "events", schema_config=narrow)
    rows = [
        ("t", 0, json.dumps({"n": i}).encode(), T0 + i, None, i) for i in range(20)
    ]
    t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    t = EventTable(spark, str(tmp_path), "events", schema_config=wide)
    big = 2**40
    rows = [
        ("t", 0, json.dumps({"n": big + i}).encode(), T0 + 100 + i, None, 20 + i)
        for i in range(20)
    ]
    t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA), existing=t.read()))

    entries = t.scan_files()
    assert len(entries) == 2
    assert all("n" in (e.get("col_stats") or {}) for e in entries)

    register_zombi_datasource(spark)
    reader = ZombiBatchReader(t.table_schema(), {"path": t.path})
    # a long-range predicate prunes the pre-promotion file by its int bounds
    reader.pushFilters([GreaterThan(("n",), 2**39)])
    reader.partitions()
    assert reader.last_plan == {
        "files_total": 2,
        "files_kept": 1,
        "partitions": 1,
        "delete_files": 0,
    }
    reader.pushFilters([EqualTo(("n",), 5)])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 1
    reader.pushFilters([EqualTo(("n",), -1)])
    reader.partitions()
    assert reader.last_plan["files_kept"] == 0

    # read parity across the mixed INT32/INT64 file set, with predicates
    df = _load(spark, t)
    assert df.schema["n"].dataType.simpleString() == "bigint"
    base_df = t.read()
    cols = sorted(df.columns)
    for cond in (f"n > {2**39}", "n = 5", "n < 0", "n IS NOT NULL"):
        assert sorted(map(tuple, df.filter(cond).select(*cols).collect())) == sorted(
            map(tuple, base_df.filter(cond).select(*cols).collect())
        ), cond


def test_format_applies_position_deletes(spark, tmp_path):
    """Merge-on-read through the format: a batch read anti-masks the
    tombstoned (file, row index) pairs executor-side — parity with
    EventTable.read after a delete, including under a fields projection
    and a pushed filter; time travel to the pre-delete snapshot still
    serves every row; the stream stays append-only (deletes do not
    retro-apply — Iceberg's incremental-scan rule)."""
    t = EventTable(spark, str(tmp_path), "events")
    t.append(prepare_events(_batch(spark, 0, 12)))
    t.append(prepare_events(_batch(spark, 12, 6)))
    register_zombi_datasource(spark)
    doomed = t.read().where("sequence % 4 = 0").count()
    r = t.delete_where("sequence % 4 = 0", mode="merge-on-read")
    assert r["rows_removed"] == doomed > 0

    df = _load(spark, t)
    base = t.read()
    cols = sorted(df.columns)
    assert sorted(map(tuple, df.select(*cols).collect())) == sorted(
        map(tuple, base.select(*cols).collect())
    )
    assert df.count() == 18 - doomed
    # fields projection composes with the anti-mask
    seqs = sorted(
        x.sequence
        for x in _load(spark, t, fields="sequence").collect()
    )
    assert seqs == sorted(x.sequence for x in base.collect())
    # pushed filter + deletes: pruning and masking are independent
    got = sorted(
        map(tuple, _load(spark, t).where("sequence > 5").select(*cols).collect())
    )
    want = sorted(map(tuple, base.where("sequence > 5").select(*cols).collect()))
    assert got == want and got
    # time travel: the pre-delete snapshot is untouched
    assert _load(spark, t, version=r["version"] - 1).count() == 18
    # the plan records the delete-file attachment
    reader = ZombiBatchReader(t.table_schema(), {"path": t.path})
    reader.pushFilters([])
    parts = reader.partitions()
    assert reader.last_plan["delete_files"] == 1
    assert any(p.deletes for p in parts)

    # stream catch-up is append-only: it re-serves the ORIGINAL appended
    # rows, tombstones not retro-applied (documented contract)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("zombi")
        .load(t.path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 18


def test_format_position_deletes_on_split_row_groups(spark, tmp_path):
    """Row-group-split slices keep in-file row indexes exact: a
    hand-built 10-row-group file is sliced per group, tombstones planted
    across groups, and every slice masks exactly its own rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.types as T

    from zombi_spark.sources.datasource import (
        ZombiInputPartition,
        _file_slices,
        _read_partition,
    )

    p = str(tmp_path / "big.parquet")
    pq.write_table(
        pa.table({"sequence": pa.array(range(1000), pa.int64())}),
        p,
        row_group_size=100,
    )
    # tombstone rows across several groups (incl. group boundaries)
    doomed = [0, 99, 100, 101, 250, 555, 999]
    dpath = str(tmp_path / "posdel.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([os.path.abspath(p)] * len(doomed)),
                "pos": pa.array(doomed, pa.int64()),
            }
        ),
        dpath,
    )
    schema = T.StructType([T.StructField("sequence", T.LongType(), True)])
    slices = _file_slices(
        {"file_path": p, "file_size_bytes": os.path.getsize(p)}, {}, max_bytes=1
    )
    assert len(slices) == 10  # one slice per row group
    got = []
    for s in slices:
        part = ZombiInputPartition(slices=[s[:3]], deletes=[dpath])
        for b in _read_partition(part, schema):
            got.extend(b.column(0).to_pylist())
    assert sorted(got) == [i for i in range(1000) if i not in doomed]
    # whole-file read agrees
    part = ZombiInputPartition(slices=[(p, {}, None)], deletes=[dpath])
    whole = [
        v for b in _read_partition(part, schema) for v in b.column(0).to_pylist()
    ]
    assert sorted(whole) == sorted(got)


def test_metadata_delete_files_table(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(prepare_events(_batch(spark, 0, 10)))
    register_zombi_datasource(spark)
    meta = (
        spark.read.format("zombi").option("metadata", "delete_files").load(t.path)
    )
    assert meta.count() == 0  # no deletes yet
    r = t.delete_where("sequence <= 2", mode="merge-on-read")
    rows = (
        spark.read.format("zombi")
        .option("metadata", "delete_files")
        .load(t.path)
        .collect()
    )
    assert len(rows) == 1
    (m,) = rows
    assert m.file_path == r["delete_file"]
    assert m.content == "position-deletes" and m.row_count == r["rows_removed"] > 0
    assert json.loads(m.referenced_files)
    # unknown metadata table error names the new surface
    with pytest.raises(Exception, match="delete_files"):
        spark.read.format("zombi").option("metadata", "nope").load(t.path).schema


def test_position_mask_soundness_fuzz(tmp_path):
    """Hypothesis fuzz of the executor-side tombstone mask: random file
    shapes (rows × row-group size), random doomed sets, random slice
    granularity — surviving values always equal the Python-set
    difference, across whole-file and split reads, exactly once each."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.types as T
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zombi_spark.sources.datasource import (
        ZombiInputPartition,
        _file_slices,
        _read_partition,
    )

    schema = T.StructType([T.StructField("sequence", T.LongType(), True)])
    counter = {"n": 0}

    @settings(max_examples=40, deadline=None)
    @given(
        n_rows=st.integers(min_value=1, max_value=400),
        rg_size=st.integers(min_value=1, max_value=97),
        doomed_frac=st.floats(min_value=0.0, max_value=1.0),
        max_bytes=st.sampled_from([1, 512, 10**9]),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(n_rows, rg_size, doomed_frac, max_bytes, seed):
        import random

        counter["n"] += 1
        p = str(tmp_path / f"fz{counter['n']}.parquet")
        pq.write_table(
            pa.table({"sequence": pa.array(range(n_rows), pa.int64())}),
            p,
            row_group_size=rg_size,
        )
        rng = random.Random(seed)
        doomed = sorted(
            i for i in range(n_rows) if rng.random() < doomed_frac
        )
        dpath = str(tmp_path / f"fz{counter['n']}-del.parquet")
        pq.write_table(
            pa.table(
                {
                    "file_path": pa.array([os.path.abspath(p)] * len(doomed)),
                    "pos": pa.array(doomed, pa.int64()),
                }
            ),
            dpath,
        )
        slices = _file_slices(
            {"file_path": p, "file_size_bytes": os.path.getsize(p)},
            {},
            max_bytes=max_bytes,
        )
        got = []
        for s in slices:
            part = ZombiInputPartition(slices=[s[:3]], deletes=[dpath])
            for b in _read_partition(part, schema):
                got.extend(b.column(0).to_pylist())
        assert sorted(got) == [i for i in range(n_rows) if i not in set(doomed)]

    check()
