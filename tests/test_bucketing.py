"""Bucketing: co-located joins without a shuffle (SURVEY §2.4 J-series /
pyspark guide partitioning section). At 100 TB the fact-fact join on
orderkey is the shuffle to kill; bucketed tables pre-co-locate it."""

import pyspark.sql.functions as F
import pytest


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # warehouse.dir is a static conf; managed tables land in ./spark-warehouse
    # (gitignored) and are dropped after the module
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_avoids_shuffle(bucketed):
    spark = bucketed
    # hint("merge"): at sf0.001 the dim side broadcasts otherwise, which
    # would sidestep the bucketed path this test is about
    joined = (
        spark.table("lineitem_b")
        .join(spark.table("orders_b").hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plan = _plan(joined)
    # both sides read bucketed: the join itself needs no hash exchange
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in join_section
    assert "Exchange hashpartitioning(o_orderkey" not in join_section
    # and it still answers correctly
    got = {r.o_orderstatus: r.n for r in joined.collect()}
    want = {
        r.o_orderstatus: r.n
        for r in spark.table("lineitem_b")
        .join(spark.table("orders_b").hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
