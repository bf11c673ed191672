"""Skew-mitigation utilities for hot join keys at scale.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains necessary when a *single* key dominates
(e.g. one topic receiving half the events — the shape zombi's per-
partition sharding is designed around, SPEC.md:658-661) or when the skew
is in an aggregation rather than a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
