"""Regression guard for the round-3 events.ts dtype break: the driver's
testdata has shipped ``ts`` both as parquet TIMESTAMP(NANOS) (readable
only as epoch-nanos long under ``nanosAsLong``) and as timestamp[us]
(TIMESTAMP_NTZ). ``zombi_events`` must produce IDENTICAL timestamp_ms
from either encoding of the same instants — and match DuckDB's
``epoch_ms`` on both."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from zombi_spark.plans.event_queries import zombi_events

ROWS = [
    (0, 1704067200_000_000_001, 3, "click", 1.5, '{"k": 1}'),
    (1, 1704067200_123_456_789, 9, "view", 2.5, '{"k": 2}'),
    (2, 1735689599_999_999_999, 4, "click", 0.0, '{"k": 3}'),
    (3, 0, 1, "init", 0.0, "{}"),
    (4, 123_456_789, 2, "early", 9.9, "{}"),  # sub-second epoch
]


def _write_events(dirpath, ts_type):
    ids, ts_ns, users, types_, vals, props = zip(*ROWS)
    # int->timestamp casts REINTERPRET the integer in the target unit, so
    # convert the nanos explicitly for coarser units
    divisor = {"ns": 1, "us": 1_000, "ms": 1_000_000}[ts_type.unit]
    ts = [t // divisor for t in ts_ns]
    table = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(ts_type),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types_, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )
    dirpath.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, str(dirpath / "events.parquet"))
    return str(dirpath)


def test_nanos_long_and_timestamp_us_agree(spark, tmp_path):
    nanos_dir = _write_events(tmp_path / "nanos", pa.timestamp("ns"))
    micros_dir = _write_events(tmp_path / "micros", pa.timestamp("us"))

    out_nanos = {
        r.arrival: r.timestamp_ms
        for r in zombi_events(spark, nanos_dir).collect()
    }
    out_micros = {
        r.arrival: r.timestamp_ms
        for r in zombi_events(spark, micros_dir).collect()
    }
    assert out_nanos == out_micros

    # both match DuckDB's epoch_ms on the same file (the oracle's CTE)
    con = duckdb.connect()
    duck = {
        r[0]: r[1]
        for r in con.execute(
            f"select event_id, epoch_ms(ts) from '{micros_dir}/events.parquet'"
        ).fetchall()
    }
    assert out_micros == duck
