"""J7 full form: stream-stream join with watermarks (Structured Streaming
interval join) — purchases enriched with signups within a 1-hour bound."""

import json
import os

import pyspark.sql.functions as F


def _write_landing(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{name}.json"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_stream_stream_interval_join(spark, tmp_path):
    base = 1704067200000
    purchases_dir = str(tmp_path / "purchases")
    signups_dir = str(tmp_path / "signups")
    _write_landing(
        purchases_dir,
        "p",
        [
            {"user_id": 1, "p_ts": base + 30 * 60000, "amount": 10.0},  # 30min after signup → match
            {"user_id": 2, "p_ts": base + 90 * 60000, "amount": 20.0},  # 90min after → no match
            {"user_id": 3, "p_ts": base + 10 * 60000, "amount": 30.0},  # no signup → no match
        ],
    )
    _write_landing(
        signups_dir,
        "s",
        [
            {"user_id": 1, "s_ts": base},
            {"user_id": 2, "s_ts": base},
            {"user_id": 4, "s_ts": base},
        ],
    )

    p = (
        spark.readStream.schema("user_id long, p_ts long, amount double")
        .json(purchases_dir)
        .withColumn("p_time", F.timestamp_millis(F.col("p_ts")))
        .withWatermark("p_time", "2 hours")
    )
    s = (
        spark.readStream.schema("user_id long, s_ts long")
        .json(signups_dir)
        .withColumnRenamed("user_id", "s_user_id")
        .withColumn("s_time", F.timestamp_millis(F.col("s_ts")))
        .withWatermark("s_time", "2 hours")
    )
    joined = p.join(
        s,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("p_time") >= F.col("s_time"))
        & (F.col("p_time") <= F.col("s_time") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("user_id", "p_ts", "s_ts", "amount")

    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: r for r in spark.sql("SELECT * FROM ss_join_out").collect()}
    assert set(got) == {1}  # only the within-bound pair joins
    assert got[1].amount == 10.0
