"""Replicates the driver's correctness gate locally: run every
``__spark_entry__.queries()`` entry on Spark at sf0.01 and compare to the
matching ``oracle_sql()`` on DuckDB — row count, column names, and an
order-insensitive value comparison."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _duck(oracle_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{oracle_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon(rows, colnames):
    """Sort columns by name, then rows — order-insensitive canonical form."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out)


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def duck_con(oracle_dir):
    return _duck(oracle_dir)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, oracle_dir, duck_con, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    sdf = q(spark, oracle_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    if name not in oracles:
        pytest.skip(f"{name}: no oracle (rows-only check); rows={len(spark_rows)}")

    rel = duck_con.execute(oracles[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"

    s = _canon([tuple(r) for r in spark_rows], spark_cols)
    d = _canon(duck_rows, duck_cols)
    mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b][:5]
    assert s == d, f"{name}: value mismatch at sorted rows {mism}: " + "; ".join(
        f"spark={s[i]} duck={d[i]}" for i in mism
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
