"""Commit atomicity (INV-5): uncommitted files are invisible to readers
and reclaimable as orphans (reference crash-point matrix CP-1..CP-6,
testing_strategy.md:379-391)."""

import os
import shutil

from zombi_spark.ingest.batch import RAW_EVENT_SCHEMA, prepare_events
from zombi_spark.operators.reads import negotiate_output_format
from zombi_spark.table.event_table import EventTable


def _batch(spark, start, n):
    rows = [("t", 0, b"x", 1704067200000 + i * 1000, None, i) for i in range(start, start + n)]
    return spark.createDataFrame(rows, RAW_EVENT_SCHEMA)


def test_uncommitted_files_invisible_and_reclaimed(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(prepare_events(_batch(spark, 0, 10)))
    assert t.read().count() == 10

    # simulate a crashed append: data file written, snapshot never committed
    committed = t.files()[0]["file_path"]
    orphan = os.path.join(os.path.dirname(committed), "crashed-append.parquet")
    shutil.copyfile(committed, orphan)

    assert t.read().count() == 10  # INV-5: reader never sees the orphan
    removed = t.remove_orphans(older_than_s=0)
    assert orphan in removed and not os.path.exists(orphan)
    assert t.read().count() == 10
    # the next real append commits and becomes visible atomically
    t.append(prepare_events(_batch(spark, 10, 5), existing=t.read()))
    assert t.read().count() == 15


def test_export_json_legacy_sink(spark, tmp_path):
    t = EventTable(spark, str(tmp_path), "events")
    t.append(prepare_events(_batch(spark, 0, 6)))
    out = str(tmp_path / "json-out")
    t.export_json(out)
    back = spark.read.json(out)
    assert back.count() == 6 and "sequence" in back.columns


def test_bloom_filter_written_for_idempotency_key(spark, tmp_path):
    """D2/X5: the parquet writer emits a bloom filter for idempotency_key
    (pyarrow 16 can't expose the footer offset, so assert via the size
    delta against the identical write without the option)."""
    rows = [("t", 0, b"x", 1704067200000, f"key-{i:05d}", i) for i in range(2000)]
    events = prepare_events(_batchify(spark, rows))
    t = EventTable(spark, str(tmp_path), "events")
    t.append(events)
    with_bloom = sum(f["file_size_bytes"] for f in t.files())
    plain_dir = str(tmp_path / "plain")
    events.coalesce(1).write.parquet(plain_dir)
    plain = sum(
        os.path.getsize(os.path.join(plain_dir, f))
        for f in os.listdir(plain_dir)
        if f.endswith(".parquet")
    )
    assert with_bloom > plain + 1000  # bloom bytes present


def _batchify(spark, rows):
    return spark.createDataFrame(rows, RAW_EVENT_SCHEMA)


def test_accept_header_negotiation():
    arrow = "application/vnd.apache.arrow.stream"
    assert negotiate_output_format(None) == "json"
    assert negotiate_output_format("application/json") == "json"
    assert negotiate_output_format(arrow) == "arrow"
    assert negotiate_output_format(f"{arrow};q=0.5, application/json;q=0.9") == "json"
    assert negotiate_output_format(f"application/json;q=0.1, {arrow};q=0.9") == "arrow"
    assert negotiate_output_format("text/html") == "json"  # unknown → default
    assert negotiate_output_format(f"{arrow};q=notanumber") == "json"  # bad q → 0
    # RFC 7231 specificity: an exact type outranks */* at equal q — the
    # standard "preferred type + wildcard fallback" header gets arrow
    assert negotiate_output_format(f"{arrow}, */*") == "arrow"
    assert negotiate_output_format(f"*/*, {arrow}") == "arrow"
    # exact-vs-exact equal-q tie falls back to json, either order
    assert negotiate_output_format(f"{arrow}, application/json") == "json"
    assert negotiate_output_format(f"application/json, {arrow}") == "json"
