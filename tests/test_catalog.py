"""Catalog surface (S13/S14): persistent registration, list/load/head,
discovery, SQL views (api/catalog.rs:193-431, storage/catalog.rs:166-216)."""

import pytest

from zombi_spark.ingest.batch import RAW_EVENT_SCHEMA, prepare_events
from zombi_spark.table.catalog import Catalog, TableNotFoundError
from zombi_spark.table.event_table import EventTable


def _batch(spark, n, topic="t"):
    rows = [(topic, 0, f"p{i}".encode(), 1704067200000 + i * 1000, None, i) for i in range(n)]
    return spark.createDataFrame(rows, RAW_EVENT_SCHEMA)


def test_register_list_load_head(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    t = cat.create_table("events-a")
    t.append(prepare_events(_batch(spark, 10)))
    cat.create_table("events-b").append(prepare_events(_batch(spark, 4, topic="u")))

    assert cat.namespaces() == ["zombi"]
    assert cat.list_tables() == ["events-a", "events-b"]
    assert cat.exists("events-a") and not cat.exists("nope")

    loaded = cat.load("events-a")
    assert loaded.read().count() == 10

    info = cat.head("events-a")
    assert info["current_version"] == 0
    assert info["partition_spec"] == ["event_date", "event_hour"]
    assert info["total_rows"] == 10
    assert info["watermarks"]["zombi.watermark.t/0"] == 10
    assert info["file_count"] > 0 and info["total_bytes"] > 0

    with pytest.raises(TableNotFoundError):
        cat.load("nope")


def test_registration_survives_restart(spark, tmp_path):
    """The registry is a file under the root: a brand-new Catalog (new
    session/process) sees every registered table."""
    cat = Catalog(spark, str(tmp_path))
    cat.create_table("persisted").append(prepare_events(_batch(spark, 6)))

    cat2 = Catalog(spark, str(tmp_path))  # fresh instance, no shared state
    assert cat2.list_tables() == ["persisted"]
    assert cat2.load("persisted").read().count() == 6


def test_discover_adopts_unregistered_tables(spark, tmp_path):
    """Lost-registry recovery: tables already on disk (snapshot log
    present) are adopted by discover()."""
    t = EventTable(spark, str(tmp_path), "orphan-table")
    t.append(prepare_events(_batch(spark, 3)))
    cat = Catalog(spark, str(tmp_path))
    assert cat.list_tables() == []
    assert cat.discover() == ["orphan-table"]
    assert cat.load("orphan-table").read().count() == 3
    assert cat.discover() == []  # idempotent


def test_drop_unregisters_without_deleting_data(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create_table("dropme").append(prepare_events(_batch(spark, 5)))
    cat.drop("dropme")
    assert not cat.exists("dropme")
    # data intact: re-discovery brings it back
    assert cat.discover() == ["dropme"]
    assert cat.load("dropme").read().count() == 5


def test_register_views_sql_surface(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create_table("view-events").append(prepare_events(_batch(spark, 8)))
    views = cat.register_views()
    assert views == ["view_events"]
    assert spark.sql("SELECT count(*) AS n FROM view_events").collect()[0].n == 8


def test_discover_skips_invalid_directory_names(spark, tmp_path):
    """Recovery must adopt every valid table even when an operator-made
    copy dir ('2024-backup') with a _zombi_meta inside fails name
    validation — skip it, never abort the reconciliation."""
    import os

    t = EventTable(spark, str(tmp_path), "alpha")
    t.append(prepare_events(_batch(spark, 2)))
    t2 = EventTable(spark, str(tmp_path), "zulu")
    t2.append(prepare_events(_batch(spark, 2)))
    os.makedirs(str(tmp_path / "2024-backup" / "_zombi_meta"))
    cat = Catalog(spark, str(tmp_path))
    # '2024-backup' sorts first — a propagated ValueError would adopt nothing
    assert cat.discover() == ["alpha", "zulu"]


def test_concurrent_registration_loses_no_tables(spark, tmp_path):
    """register() is a locked read-modify-write: N threads registering
    distinct tables concurrently must all survive in the registry (tmp +
    rename alone only prevents torn files, not lost updates)."""
    from concurrent.futures import ThreadPoolExecutor

    cat = Catalog(spark, str(tmp_path))
    names = [f"tab{i}" for i in range(16)]
    with ThreadPoolExecutor(8) as ex:
        list(ex.map(cat.register, names))
    assert cat.list_tables() == sorted(names)
