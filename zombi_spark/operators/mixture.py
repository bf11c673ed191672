"""Data-mixture sampling for training runs — hit a target source mix
with per-source EPOCH weights (the "sample source A 2.3 times, B 0.4
times" knob every large pretraining data pipeline has; same family as
the sampling the reference's training exports would feed).

A weight w for a source means every doc of that source appears
floor(w) times for certain, plus once more with probability frac(w) —
decided by a deterministic hash gate on (id, seed), the same
RNG-free device as ``sharding.split_assignment``. Properties that
matter at 100 TB:

- NO shuffle: the whole transform is a literal-map lookup + sequence +
  explode + hash filter — narrow, pipelined inside one stage, scales
  with input splits.
- Rerun- and row-order-stable: the gate depends only on (id, seed), so
  re-running on a repartitioned corpus selects the SAME docs, and the
  emitted ``epoch`` column is the same — resumable exports.
- Fractional-epoch selection is doc-level (not row-duplication noise):
  the docs that get the extra pass are a fixed pseudo-random subset, so
  two exporters at the same seed agree on it.

``mixture_report`` reconciles the achieved mix (rows and optionally a
token column) against the target shares — the check a dataset card
wants before a run starts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zombi_spark.functions.hashing import md5_long

_GATE_M = 1_000_000  # per-mille-of-per-mille gate resolution


def _hash_gate(id_col: Column, seed: int) -> Column:
    """Deterministic uniform-ish value in [0, 1) from (id, seed) —
    md5-derived like the sampling/sharding gates, so the DuckDB oracle
    can recompute the exact selected subset (xxhash64 would be marginally
    cheaper but has no cross-engine twin; this is one hash per doc)."""
    h = md5_long(F.concat(id_col.cast("string"), F.lit(f":mix:{seed}")))
    return F.pmod(h, F.lit(_GATE_M)) / F.lit(_GATE_M)


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Epoch-weighted mixture sample. Output = input columns + ``epoch``
    (0-based pass number; a doc with weight 2.3 appears with epoch 0, 1
    and — for the gated 30% subset — 2). Sources absent from
    ``weights`` are dropped (weight 0)."""
    if not weights:
        raise ValueError("weights must name at least one source")
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {s!r}: {w}")
    w_col = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv]
        )[F.col(source_col)].cast("double"),
        F.lit(0.0),
    )
    whole = F.floor(w_col).cast("int")
    frac = w_col - whole
    # full epochs 0..whole-1, plus epoch `whole` for the hash-gated
    # fractional subset; empty array = dropped doc (filtered by explode)
    epochs = F.concat(
        F.when(whole > 0, F.sequence(F.lit(0), whole - 1)).otherwise(
            F.array().cast("array<int>")
        ),
        F.when(
            (frac > 0) & (_hash_gate(F.col(id_col), seed) < frac),
            F.array(whole),
        ).otherwise(F.array().cast("array<int>")),
    )
    return docs.withColumn("epoch", F.explode(epochs))


def cap_per_source(
    docs: DataFrame,
    max_docs: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Per-source document cap — the other half of mixture control:
    weights upsample, caps BOUND a dominant source (a crawl dump that is
    40% of the corpus) so it can't swamp the mix. Keeps at most
    ``max_docs`` docs per source, selected by a deterministic
    pseudo-random order (md5 of (id, seed), id tiebreak) — an unbiased
    sample of the source, stable under reruns and repartitioning, NOT
    "first N by id" (ids usually correlate with crawl time).

    Scale shape (the 40%-source case is the POINT of this operator, so a
    plain ``Window.partitionBy(source)`` — all of that source through
    one task — would be self-defeating): sources at/under the cap pass
    through with no ranking at all; each over-cap source is first
    PREFILTERED by a closed-form order-hash cutoff — the md5 order is
    uniform in [0, 2⁶⁰), so keeping hashes below
    ``2⁶⁰·(max_docs + 6√max_docs + 10)/n`` yields ≥ ``max_docs``
    candidates except at ~6σ binomial odds, and a one-row-per-source
    verification catches even that tail (an undershooting source falls
    back to its full row set) — then only the bounded candidate set goes
    through the exact rank: the single-task window state is O(max_docs),
    never O(source). The selected set is IDENTICAL to the naive
    full-source ranking: the prefilter is a verified superset of the
    true top set under the same total order."""
    if max_docs <= 0:
        raise ValueError(f"max_docs must be positive, got {max_docs}")
    from pyspark.sql import Window

    order = md5_long(F.concat(F.col(id_col).cast("string"), F.lit(f":cap:{seed}")))
    sized = docs.withColumn("_ord", order)
    counts = {
        r[source_col]: r["n"]
        for r in sized.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    # NULL source is its own group: isin()/map-lookup three-valued logic
    # would otherwise drop NULL-source rows from BOTH branches (silent
    # data loss) or TypeError sorting None against str.
    null_n = counts.pop(None, 0)
    over = sorted(s for s, n in counts.items() if n > max_docs)
    null_over = null_n > max_docs
    if not over and not null_over:
        return docs  # nothing exceeds the cap — zero extra work
    is_null = F.col(source_col).isNull()
    over_pred = F.col(source_col).isin(over) if over else F.lit(False)
    if null_over:
        over_pred = over_pred | is_null
    # coalesce: isin() yields NULL (not False) for a NULL source
    over_pred = F.coalesce(over_pred, F.lit(False))
    under_df = sized.where(~over_pred).drop("_ord")
    big = sized.where(over_pred)
    margin = 6 * max_docs**0.5 + 10

    def _cut(n: int) -> int:
        return int(min(1.0, (max_docs + margin) / n) * (1 << 60))

    if over:
        cut_map = F.create_map(
            *[x for s in over for x in (F.lit(s), F.lit(_cut(counts[s])))]
        )
        cutoff = cut_map[F.col(source_col)]
    else:
        # only the NULL group is over the cap: a zero-entry create_map()
        # types as map<void,void> and cannot be indexed by a string key
        cutoff = F.lit(None).cast("long")
    if null_over:
        cutoff = F.when(is_null, F.lit(_cut(null_n))).otherwise(cutoff)
    pre = big.where(F.col("_ord") <= cutoff)
    got = {
        r[source_col]: r["n"]
        for r in pre.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    short = [s for s in over if got.get(s, 0) < min(max_docs, counts[s])]
    null_short = null_over and got.get(None, 0) < min(max_docs, null_n)
    if short or null_short:  # ~6σ tail: take those sources whole — correctness first
        keep_whole = F.col(source_col).isin(short) if short else F.lit(False)
        if null_short:
            keep_whole = keep_whole | is_null
        pre = big.where((F.col("_ord") <= cutoff) | F.coalesce(keep_whole, F.lit(False)))
    w = Window.partitionBy(source_col).orderBy(F.col("_ord").asc(), F.col(id_col).asc())
    capped = (
        pre.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_docs)
        .drop("_rn", "_ord")
    )
    return under_df.unionByName(capped)


def mixture_report(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    token_col: str | None = None,
) -> DataFrame:
    """Per-source achieved vs target mix for the sample
    :func:`mixture_sample` would emit — one aggregate pass over the
    corpus. Columns: source, input_docs, weight, sampled_rows,
    achieved_share_pm, target_share_pm (+ sampled_tokens with
    ``token_col``). Shares are per-mille integers (exact cross-engine)."""
    sampled = mixture_sample(docs, weights, source_col, id_col, seed)
    aggs = [F.count("*").alias("sampled_rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("sampled_tokens"))
    per_source = sampled.groupBy(source_col).agg(*aggs)
    # input_docs comes from the CORPUS, and every weighted source gets a
    # row even when the sample is empty (a fractional weight whose hash
    # gate selected nothing must surface achieved=0 vs its target, not
    # vanish from the reconciliation)
    inputs = (
        docs.where(F.col(source_col).isin(list(weights)))
        .groupBy(source_col)
        .agg(F.countDistinct(id_col).alias("input_docs"))
    )
    listed = docs.sparkSession.createDataFrame(
        [(s,) for s in weights], f"{source_col} string"
    )
    per_source = (
        listed.join(inputs, source_col, "left")
        .join(per_source, source_col, "left")
        .na.fill(
            {
                "input_docs": 0,
                "sampled_rows": 0,
                **({"sampled_tokens": 0} if token_col is not None else {}),
            }
        )
    )
    total = float(sum(weights.values()))
    target = F.create_map(
        *[
            x
            for s, w in weights.items()
            for x in (F.lit(s), F.lit(int(round(1000 * w / total))))
        ]
    )
    # grand total enters as a broadcast one-row aggregate (no eager
    # .first() action — the report plan stays lazy end-to-end, like tfidf)
    grand = per_source.agg(
        F.greatest(F.lit(1).cast("long"), F.sum("sampled_rows")).alias("_grand")
    )
    return (
        per_source.crossJoin(F.broadcast(grand))
        .select(
            source_col,
            "input_docs",
            F.coalesce(
                F.create_map(
                    *[F.lit(x) for kv in weights.items() for x in kv]
                )[F.col(source_col)].cast("double"),
                F.lit(0.0),
            ).alias("weight"),
            "sampled_rows",
            *(["sampled_tokens"] if token_col is not None else []),
            F.floor(F.lit(1000) * F.col("sampled_rows") / F.col("_grand"))
            .cast("long")
            .alias("achieved_share_pm"),
            target[F.col(source_col)].cast("long").alias("target_share_pm"),
        )
        .orderBy(source_col)
    )
