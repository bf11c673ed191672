"""Deterministic dataset splits and training shards.

The last mile of a training-data pipeline: after dedup/filter/sample, the
corpus is split (train/val/test) and written as a stable set of shards.
Both operations here are RNG-free — assignment is a pure function of the
row id — so reruns, speculative retries, and incremental re-exports
produce byte-identical partitions (the same determinism contract as
q_deterministic_sample).

Scale notes: split assignment is a projection (no shuffle); shard export
is exactly one shuffle on the shard id with one sorted file per shard —
at 100 TB pick n_shards so a shard is a few GB, and writers stream
without skew because the hash is uniform in the id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zombi_spark.functions.hashing import md5_long


def _unit_hash(id_col: Column, seed: int) -> Column:
    """Deterministic uniform [0, 1) from (id, seed) — md5-derived, engine
    portable (same construction as the sampling operator)."""
    h = md5_long(F.concat(id_col.cast("string"), F.lit(f":{seed}")))
    return (F.pmod(h, F.lit(1_000_000)) / F.lit(1_000_000.0)).alias("u")


def split_assignment(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Add a ``split`` column assigning each row to one named split with
    the given weights (must sum to ~1) — stable under reruns and
    independent of row order/partitioning.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = _unit_hash(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = sorted(weights)  # deterministic boundary order
    for name in names[:-1]:
        acc += weights[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def shard_id(id_col: Column, n_shards: int, seed: int = 11) -> Column:
    """Deterministic shard in [0, n_shards) from the row id."""
    return F.pmod(
        md5_long(F.concat(id_col.cast("string"), F.lit(f":shard:{seed}"))),
        F.lit(n_shards),
    ).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 11,
) -> None:
    """Export as ``shard=K`` parquet dirs, one sorted file per shard:
    repartition on the exact shard id (each shard → one task → one file),
    rows sorted by id within the shard so re-exports are byte-stable.
    """
    with_shard = df.withColumn("shard", shard_id(F.col(id_col), n_shards, seed))
    (
        with_shard.repartition(n_shards, "shard")
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
