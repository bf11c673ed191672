"""Read-surface tests: tail reads, range scans, has_more paging, Arrow
output (reference integration_tests.rs:617-744, 1655-1885)."""

import pytest

from zombi_spark.ingest.batch import RAW_EVENT_SCHEMA, prepare_events
from zombi_spark.operators import reads as R
from zombi_spark.table.event_table import EventTable


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    t = EventTable(spark, str(tmp_path_factory.mktemp("reads")), "events")
    rows = [
        ("t", i % 3, f"p{i}".encode(), 1704067200000 + i * 1000, None, i) for i in range(60)
    ]
    t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    return t


def test_tail_read_defaults_and_since(spark, table):
    page = R.tail_read(table.read(), since_ms=1704067230000, limit=10).collect()
    rows, more = R.has_more(page, 10)
    assert len(rows) == 10 and more
    assert set(rows[0].asDict()) == {"payload", "timestamp_ms"}  # default projection
    assert all(r.timestamp_ms >= 1704067230000 for r in rows)
    ts = [r.timestamp_ms for r in rows]
    assert ts == sorted(ts)


def test_tail_read_last_page_no_more(spark, table):
    page = R.tail_read(table.read(), since_ms=1704067255000, limit=10).collect()
    rows, more = R.has_more(page, 10)
    assert len(rows) == 5 and not more


def test_custom_projection(spark, table):
    page = R.tail_read(table.read(), limit=3, fields="sequence,partition").collect()
    assert set(page[0].asDict()) == {"sequence", "partition"}


def test_sequence_range_scan(spark, table):
    out = R.sequence_range_scan(table.read(), partition=1, start_offset=5, limit=100).collect()
    seqs = [r.sequence for r in out]
    assert seqs == list(range(5, 21))  # 20 events in partition 1
    assert all(r.partition == 1 for r in out)


def test_timestamp_range_half_open(spark, table):
    out = R.timestamp_range_scan(
        table.read(), since_ms=1704067210000, until_ms=1704067220000
    ).collect()
    assert len(out) == 10
    assert all(1704067210000 <= r.timestamp_ms < 1704067220000 for r in out)


def test_arrow_output(spark, table):
    tbl = R.to_arrow_batches(R.tail_read(table.read(), limit=5))
    import pyarrow as pa

    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 6  # limit+1 contract
    assert {"payload", "timestamp_ms"} <= set(tbl.column_names)
