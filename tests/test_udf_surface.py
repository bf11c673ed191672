"""§2.12 UDF surface: python UDF, pandas UDF (scalar + grouped), SQL
registration. The engine's policy is built-ins-first; these tests pin the
extension points stay functional for operators that genuinely need them."""

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import types as T


def test_pandas_udf_scalar_and_sql_registration(spark):
    @F.pandas_udf(T.DoubleType())
    def payload_entropy(s: pd.Series) -> pd.Series:
        # toy per-value entropy — Arrow-batched, vectorized pandas ops
        import numpy as np

        def ent(x: str) -> float:
            if not x:
                return 0.0
            counts = pd.Series(list(x)).value_counts(normalize=True)
            return float(-(counts * np.log2(counts)).sum())

        return s.map(ent)

    spark.udf.register("payload_entropy", payload_entropy)
    df = spark.createDataFrame([("aaaa",), ("abcd",)], "s string")
    df.createOrReplaceTempView("udf_in")
    got = {r.s: r.e for r in spark.sql("SELECT s, payload_entropy(s) AS e FROM udf_in").collect()}
    assert got["aaaa"] == 0.0 and abs(got["abcd"] - 2.0) < 1e-9


def test_grouped_agg_pandas_udf(spark):
    @F.pandas_udf(T.DoubleType())
    def p90(v: pd.Series) -> float:
        return float(v.quantile(0.9, interpolation="linear"))

    df = spark.createDataFrame([(i % 2, float(i)) for i in range(101)], "k int, v double")
    got = {r.k: r.p for r in df.groupBy("k").agg(p90("v").alias("p")).collect()}
    assert got[0] == pd.Series([float(i) for i in range(0, 101, 2)]).quantile(0.9)


def test_apply_in_pandas_grouped_map(spark):
    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["centered"] = pdf["v"] - pdf["v"].mean()
        return pdf

    df = spark.createDataFrame([(i % 3, float(i)) for i in range(30)], "k int, v double")
    out = df.groupBy("k").applyInPandas(center, "k int, v double, centered double")
    sums = {r.k: round(r.s, 9) for r in out.groupBy("k").agg(F.sum("centered").alias("s")).collect()}
    assert all(v == 0.0 for v in sums.values())  # centering property
