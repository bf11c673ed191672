"""Scale-smoke harness internals: the relational smoke (round 12) runs
the REAL query functions against scaled sf_dir-shaped fact tables, so
its derivations carry correctness contracts of their own — replica key
shifts must keep joins within a replica (order-count ratio exactly the
factor), dims must stay unscaled, and the bench's core-seconds helper
must actually count this process tree's CPU."""

import os

import pytest
from pyspark.sql import functions as F

from zombi_spark.plans.scalebench import _scaled_facts_dir, relational_scale_smoke
from zombi_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_scaled_facts_dir_scales_facts_not_dims(spark, tmp_path):
    d1 = _scaled_facts_dir(spark, SF, str(tmp_path), 1)
    d3 = _scaled_facts_dir(spark, SF, str(tmp_path), 3)
    for t in ("orders", "customer", "events"):
        n1 = spark.read.parquet(os.path.join(d1, f"{t}.parquet")).count()
        n3 = spark.read.parquet(os.path.join(d3, f"{t}.parquet")).count()
        assert n1 == load_table(spark, SF, t).count()
        assert n3 == 3 * n1, t
    for t in ("nation", "region"):
        assert (
            spark.read.parquet(os.path.join(d3, f"{t}.parquet")).count()
            == load_table(spark, SF, t).count()
        ), t
    # replica 0 is byte-identical pass-through; replica keys never collide
    o3 = spark.read.parquet(os.path.join(d3, "orders.parquet"))
    assert o3.select("o_orderkey").distinct().count() == o3.count()
    # every replica's custkeys still join customer (within-replica only)
    c3 = spark.read.parquet(os.path.join(d3, "customer.parquet"))
    n_match = o3.join(c3, o3.o_custkey == c3.c_custkey, "left_semi").count()
    base_match = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .count()
    )
    assert n_match == 3 * base_match


def test_relational_scale_smoke_linearity_at_factor_2(spark, tmp_path):
    out = relational_scale_smoke(spark, SF, str(tmp_path), factor=2)
    # grouped-output queries: group rows constant, order counts exactly 2x
    assert out["scale_join_dims_orders_ratio"] == 2.0
    assert out["scale_grouping_analytics_orders_ratio"] == 2.0
    assert out["scale_join_dims_rows_ratio"] == 1.0
    assert out["scale_grouping_analytics_rows_ratio"] == 1.0
    # sessionization: replica-disjoint users => sessions exactly 2x
    assert out["scale_sessionization_rows_ratio"] == 2.0
    for name in ("join_dims", "sessionization", "grouping_analytics"):
        assert out[f"scale_{name}_x1_sec"] > 0
        assert out[f"scale_{name}_x2_sec"] > 0
        assert len(out[f"scale_{name}_x1_runs"]) >= 2


def test_tree_cpu_seconds_counts_own_burn():
    import bench

    a = bench._tree_cpu_seconds()
    assert a > 0
    # burn ~0.2s of CPU in-process; the tree total must move by roughly
    # that much (lower bound loose: scheduler ticks are 10ms grains)
    x = 0
    import time

    t0 = time.process_time()
    while time.process_time() - t0 < 0.25:
        x += 1
    b = bench._tree_cpu_seconds()
    assert b - a >= 0.15, (a, b)


def test_pipeline_e2e_ledger_is_deterministic(spark, tmp_path):
    """bench.run_pipeline_e2e's row ledger is the round-over-round diff
    anchor (three identical ledgers across r12's sf0.1 runs) — a stage
    that goes nondeterministic (seeded sampling replaced by rand(),
    unstable dedup winner, hash-order-dependent packing) must fail HERE,
    not as an unexplained ledger drift in the next round's artifact."""
    import bench

    e1: dict = {}
    e2: dict = {}
    bench.run_pipeline_e2e(spark, "/root/testdata/sf0.01", str(tmp_path / "a"), e1)
    bench.run_pipeline_e2e(spark, "/root/testdata/sf0.01", str(tmp_path / "b"), e2)
    assert e1["pipeline_e2e_rows"] == e2["pipeline_e2e_rows"]
    ledger = e1["pipeline_e2e_rows"]
    assert len(ledger) == 9 and ledger[0] > 0
    # rows are non-increasing through the filter stages (in → dedup →
    # span → decon → pii → quality); mixture may add epoch copies
    for a, b in zip(ledger[:5], ledger[1:6]):
        assert b <= a, ledger
    assert set(e1["pipeline_e2e_stage_secs"]) == {
        "dedup", "span", "decon", "pii", "quality", "mixture", "pack_shard",
    }
