"""Salted join/aggregate equivalence tests."""

from pyspark.sql import functions as F

from zombi_spark.operators.skew import salted_aggregate, salted_join


def test_salted_join_matches_plain_join(spark):
    # 90% of rows share one hot key
    big = spark.createDataFrame(
        [(0 if i % 10 else i % 5, i) for i in range(1000)], "k int, v long"
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(5)], "k int, name string")
    plain = big.join(small, ["k"]).groupBy("k", "name").agg(F.sum("v").alias("s"))
    salted = salted_join(big, small, ["k"], salt_buckets=8).groupBy("k", "name").agg(
        F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame([(i % 3, i, i * 2) for i in range(500)], "k int, a long, b long")
    plain = df.groupBy("k").agg(
        F.sum("a").alias("sum_a"), F.count("b").alias("count_b"), F.max("b").alias("max_b")
    )
    salted = salted_aggregate(df, ["k"], {"a": "sum", "b": "count"}, salt_buckets=4)
    ps = {r.k: (r.sum_a, r.count_b) for r in plain.collect()}
    ss = {r.k: (r.sum_a, r.count_b) for r in salted.collect()}
    assert ps == ss
