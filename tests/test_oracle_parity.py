"""Replicates the driver's correctness gate locally: run every
``__spark_entry__.queries()`` entry on Spark at sf0.01 and compare to the
matching ``oracle_sql()`` on DuckDB — row count, column names, and an
order-insensitive value comparison.

IMPORTANT (round-1 lesson): the driver normalizes BOTH result sets through
pandas, so engine-native integer widths leak into the hash. DuckDB
``sum(<integer>)`` returns HUGEINT which pandas coerces to float64
("609.0" vs Spark int64's "609") even when values are identical. This
suite therefore goes through ``.df()`` / ``toPandas()`` (NOT ``fetchall``)
and compares pandas-rendered values, replicating the driver's coercion.
"""

import math
import os
import sys

import duckdb
import pandas as pd
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
    # Mirrors the driver: pandas-rendered values. float64 123.0 renders
    # "123.0" — intentionally DIFFERENT from int64's "123" so dtype
    # divergence between engines is caught locally.
    try:
        if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
            return "NULL"
    except (TypeError, ValueError):
        pass  # arrays don't reduce to a truth value
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_pdf(pdf):
    """Sort columns by name, then rows — order-insensitive canonical form
    over a pandas frame (the driver's unit of comparison)."""
    pdf = pdf[sorted(pdf.columns)]
    out = [tuple(_norm(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(out)


QUERY_NAMES = sorted(entrymod.queries().keys())
EXTRA_NAMES = sorted(entrymod.extra_queries().keys())


def _lookup(name):
    """Resolve a query + oracle from either registry (driver window or
    the local-only extras)."""
    if name in entrymod.queries():
        return entrymod.queries()[name], entrymod.oracle_sql().get(name)
    return entrymod.extra_queries()[name], entrymod.extra_oracle_sql().get(name)


@pytest.fixture(scope="module")
def duck_con(oracle_dir):
    return _duck(oracle_dir)


@pytest.mark.parametrize("name", QUERY_NAMES + EXTRA_NAMES)
def test_query_matches_oracle(spark, oracle_dir, duck_con, name):
    q, oracle = _lookup(name)
    sdf = q(spark, oracle_dir)
    spark_pdf = sdf.toPandas()

    if oracle is None:
        pytest.skip(f"{name}: no oracle (rows-only check); rows={len(spark_pdf)}")

    duck_pdf = duck_con.execute(oracle).df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), f"{name}: column names differ"
    assert len(spark_pdf) == len(duck_pdf), f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"

    s = _canon_pdf(spark_pdf)
    d = _canon_pdf(duck_pdf)
    mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b][:5]
    assert s == d, f"{name}: value mismatch at sorted rows {mism}: " + "; ".join(
        f"spark={s[i]} duck={d[i]}" for i in mism
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_exactly_50_queries_all_with_oracles():
    """The driver checks the FIRST 50 queries() entries (observed:
    CORRECTNESS_r03 silently dropped the registered 51st). Pin the
    contract: exactly 50 entries, every one with an oracle, so nothing
    ships driver-unverified. Rotated-out/extra queries live in
    extra_queries() with the same oracle contract, disjoint from the
    driver window."""
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert len(qs) == 50, f"driver checks first 50; got {len(qs)}"
    missing = [k for k in qs if k not in os_]
    assert not missing, f"queries without oracles: {missing}"
    assert set(os_) <= set(qs), f"orphan oracles: {set(os_) - set(qs)}"
    ex_q = entrymod.extra_queries()
    ex_o = entrymod.extra_oracle_sql()
    assert set(ex_o) <= set(ex_q), f"orphan extra oracles: {set(ex_o) - set(ex_q)}"
    assert not (set(ex_q) & set(qs)), "extras must not shadow driver-window names"
    missing_extra = [k for k in ex_q if k not in ex_o]
    assert not missing_extra, f"extra queries without oracles: {missing_extra}"


def test_plan_cache_is_session_scoped_and_gc_safe():
    """A new session must never see a dead session's cached plans, even
    if CPython reuses the dead object's id — the cache is keyed on the
    live object (WeakKeyDictionary), not id(), and dead sessions' entries
    are evicted with the session."""
    import gc

    from zombi_spark.plans.plan_cache import _SESSION_CACHES, session_cache

    class FakeSession:
        pass

    s1 = FakeSession()
    session_cache(s1, "ns")["k"] = "old-plan"
    assert session_cache(s1, "ns")["k"] == "old-plan"
    old_id = id(s1)
    del s1
    gc.collect()
    # dead session's cache is gone (no leak)
    assert not any(id(k) == old_id for k in list(_SESSION_CACHES.keys()))
    # a new session — even at a recycled id — starts empty
    for _ in range(64):
        s2 = FakeSession()
        assert "k" not in session_cache(s2, "ns")
        del s2


def test_simhash_oracle_width_assumption_holds():
    """The simhash_near_dup oracle SQL hardwires 16-bit hashes / 4-bit
    chunks while the Spark query DERIVES the width from corpus size
    (bits=None). Pin the coupling loudly: at both oracle-checked scales
    the derivation must yield 16 — if the harness ever runs a corpus
    where simhash_bits_for returns something else, this fails with a
    message instead of an opaque hash mismatch. Update the oracle's hash
    width, chunk count and chunk mask together with this test."""
    from zombi_spark.operators.dedup import simhash_bits_for

    # sf0.01: 500 docs + 10 planted near-dups; sf0.1: 5000 + 100
    for n in (510, 5100):
        assert simhash_bits_for(n) == 16, (
            f"derived simhash width changed for n={n}; the simhash_near_dup "
            "oracle SQL assumes 16 bits and must be updated in lockstep"
        )
