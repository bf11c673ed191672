"""Parquet table loaders for the driver's synthetic datasets (TESTDATA.md).

These scans are the engine's cold-read path (reference: cold Parquet scan,
iceberg_storage.rs:1389-1476). With Spark, predicate pushdown, column
pruning and partition pruning come from Catalyst — verified in
tests/test_plans.py by inspecting PushedFilters/ReadSchema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # pin UTC for EVERY table, not just events: orders/lineitem carry
    # timestamp columns whose year()/date_trunc()/grouping boundaries
    # shift with the session zone, while the DuckDB oracle stays UTC —
    # without the pin, hash parity depends on the HOST timezone and on
    # whether an events query happened to run first in the session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS,false) —
        # which Spark only reads as a long of epoch-nanos — and as
        # timestamp[us] (TIMESTAMP_NTZ). Enable nanosAsLong for the former;
        # the NTZ case reads natively and zombi_events() branches on the
        # resulting dtype.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def table_row_count(sf_dir: str, name: str) -> int | None:
    """Exact row count from parquet FOOTER metadata — no Spark job.

    This is the plan-time statistics read the pairwise operators use to
    size their shuffles (session.ensure_shuffle_width): at 100 TB the
    count comes from table metadata (footers / manifest row_count sums,
    the same numbers EventTable keeps per file), never from a scan. Cost
    is O(files) driver-side footer reads.

    Reads through pyarrow's LOCAL-filesystem discovery; for an ``sf_dir``
    Spark can read but pyarrow cannot (s3://, hdfs://) this returns
    ``None`` instead of raising — every consumer treats the count as an
    optional statistic (``n_docs``/``n_rows`` keyword), so a missing
    count degrades to "skip the shuffle-width ratchet", never to a
    plan-build failure.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    try:
        import pyarrow.dataset as ds

        dataset = ds.dataset(os.path.join(sf_dir, f"{name}.parquet"), format="parquet")
        return sum(f.metadata.num_rows for f in dataset.get_fragments())
    except (OSError, ValueError, NotImplementedError, ImportError):
        return None


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view (for spark.sql plans)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
