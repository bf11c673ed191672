"""Benchmark decontamination: flag training documents that contain
benchmark/eval items, by n-gram containment — the standard LLM
data-pipeline step (n-gram overlap against held-out sets, as described
in the GPT-3 and Llama data papers).

Semantics: a training doc is contaminated by a benchmark item when the
share of the ITEM's distinct word n-grams that also appear in the doc
reaches a threshold (containment, not Jaccard — a long doc that embeds
a short eval item verbatim must score 1.0 regardless of how much other
text surrounds it).

Scale shape (100 TB corpus, benchmark ≪ corpus by construction): the
benchmark side shingles to a small frame that Catalyst broadcasts, so
the corpus pays ONE shingle pass and a broadcast-hash join on the
shingle — no shuffle of corpus text, no all-pairs anything. The
per-pair tally aggregates integers only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zombi_spark.operators.dedup import shingle_index


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Per (doc, benchmark item) containment in permille:
    ``1000 · |shingles(item) ∩ shingles(doc)| / |shingles(item)|``.
    Pairs with zero overlap are absent. Items shorter than ``n`` words
    produce no shingles and are never flagged (too short to attribute)."""
    bench_sh = shingle_index(benchmark, n=n, id_col=bench_id_col).select(
        bench_id_col, "shingle"
    )
    sizes = bench_sh.groupBy(bench_id_col).agg(F.count("*").alias("_n_item"))
    # Broadcast-filter BEFORE the per-doc distinct (r17, guide §2.3/§2.4):
    # the old shape built the distinct (doc, shingle) index first, which
    # shuffles the corpus' ENTIRE exploded n-gram stream just to dedup it
    # — then threw almost all of it away in the broadcast join against
    # the (tiny, ≪ corpus by construction) benchmark side. Joining the
    # raw gram slots against the broadcast first means the only rows that
    # ever reach an exchange are actual benchmark matches (≈ contaminated
    # docs), and the dedup that makes each common shingle count once runs
    # over that filtered stream. Identical counts: dropDuplicates on
    # (doc, item, gram) leaves exactly one row per common shingle per
    # pair, which is what joining two distinct sides produced.
    from zombi_spark.operators.dedup import exploded_shingles
    from zombi_spark.operators.skew import spread_narrow_scan

    doc_grams = exploded_shingles(spread_narrow_scan(docs, id_col), n=n, id_col=id_col)
    overlap = (
        doc_grams.join(
            F.broadcast(bench_sh), doc_grams["gram"] == bench_sh["shingle"]
        )
        .dropDuplicates([id_col, bench_id_col, "gram"])
        .groupBy(id_col, bench_id_col)
        .agg(F.count("*").alias("_n_shared"))
    )
    return (
        overlap.join(F.broadcast(sizes), bench_id_col)
        .select(
            id_col,
            bench_id_col,
            F.floor(F.lit(1000) * F.col("_n_shared") / F.col("_n_item"))
            .cast("long")
            .alias("containment_pm"),
        )
    )


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    threshold_pm: int = 500,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Distinct ids of training docs contaminated by ANY benchmark item
    at/above the threshold, with the worst offending item and score."""
    scores = contamination_scores(docs, benchmark, n, id_col, bench_id_col)
    return (
        scores.where(F.col("containment_pm") >= threshold_pm)
        .groupBy(id_col)
        .agg(
            F.max(F.struct("containment_pm", bench_id_col)).alias("_worst"),
            F.count("*").alias("n_items_matched"),
        )
        .select(
            id_col,
            F.col(f"_worst.{bench_id_col}").alias("worst_item"),
            F.col("_worst.containment_pm").alias("worst_containment_pm"),
            "n_items_matched",
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    threshold_pm: int = 500,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """The cleaned corpus: ``docs`` minus contaminated rows (left-anti
    join on the flagged id set — one broadcastable small side)."""
    bad = contaminated_ids(docs, benchmark, n, threshold_pm, id_col, bench_id_col)
    return docs.join(bad.select(id_col), id_col, "left_anti")


# ------------------------------------------------------------------ semantic
def semantic_contamination_scores(
    corpus_embs: DataFrame,
    bench_embs: DataFrame,
    threshold_e6: int = 950_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Embedding-space contamination: (doc, benchmark item) pairs whose
    cosine reaches ``threshold_e6`` (cosine × 10⁶, the exact integer
    scale the similarity family uses). Catches paraphrased/reformatted
    eval items that n-gram containment misses — the complementary check
    modern decontamination runs alongside verbatim overlap.

    Scale shape mirrors :func:`contamination_scores`: the benchmark side
    is small by construction and BROADCAST; the corpus pays one
    projection pass (corpus × |bench| comparisons inside one stage, no
    corpus shuffle). Output: (id, bench item, cos_e6), only pairs at/
    above threshold."""
    from zombi_spark.operators.similarity import cosine_e6_prequantized, with_quantized

    c = with_quantized(corpus_embs, vec_col).select(
        F.col(id_col), F.col("qvec").alias("_c_q"), F.col("vnorm").alias("_c_n")
    )
    b = with_quantized(bench_embs, vec_col).select(
        F.col(bench_id_col), F.col("qvec").alias("_b_q"), F.col("vnorm").alias("_b_n")
    )
    cos = cosine_e6_prequantized(
        F.col("_b_q"), F.col("_c_q"), F.col("_b_n"), F.col("_c_n")
    )
    return (
        c.join(F.broadcast(b))
        .select(id_col, bench_id_col, cos.alias("cos_e6"))
        .where(F.col("cos_e6") >= threshold_e6)
    )


def semantic_decontaminate(
    corpus_embs: DataFrame,
    bench_embs: DataFrame,
    threshold_e6: int = 950_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """The cleaned corpus: rows whose embedding is semantically close to
    NO benchmark item (left-anti on the flagged id set)."""
    bad = semantic_contamination_scores(
        corpus_embs, bench_embs, threshold_e6, id_col, vec_col, bench_id_col
    ).select(id_col).distinct()
    return corpus_embs.join(bad, id_col, "left_anti")
