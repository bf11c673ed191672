"""Language-model quality scoring — the CCNet-style perplexity filter
(Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data"): score each document by a character n-gram model
trained on a trusted reference corpus and drop the worst tail. The
heavyweight public pipelines use a KenLM 5-gram over wordpieces; the
distributed shape is identical with a char-trigram model, which needs
no external artifacts and trains in two aggregations.

Model: add-one-smoothed conditional trigram probabilities

    P(c₃ | c₁c₂) = (count(c₁c₂c₃) + 1) / (count(c₁c₂) + V)

with V = training charset size. Scale shape:

- TRAIN: one explode over the reference corpus + two hash aggregates
  (trigram counts, bigram-context counts). The model is bounded by
  charset³ (~1M rows for full ASCII), far under charset-agnostic
  corpus size — it broadcasts.
- SCORE: one explode per document + a broadcast left join against the
  model + one re-aggregate per doc. No corpus shuffle beyond the
  per-doc aggregate; unseen trigrams back off to the smoothed floor,
  unseen contexts to 1/V.

Scores are average log-probability per trigram × 10⁶ (integer,
higher = more reference-like); gibberish and non-language byte soup
score far below natural text, which is the filtering signal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exploded_char_ngrams(
    docs: DataFrame, text: Column, n: int, *keep: str
) -> DataFrame:
    """One row per character n-gram of ``text`` (column ``gram``), with
    ``keep`` columns carried through. Codegen-friendly: explode an INT
    position sequence, then one substr per row — no interpreted
    higher-order lambda building a string array per document (measured
    ~2× on the 1.5M-trigram scoring pass at sf0.1)."""
    base = docs.select(*keep, text.alias("_lt")).where(F.length("_lt") >= n)
    return base.select(
        *keep,
        F.explode(F.sequence(F.lit(1), F.length("_lt") - (n - 1))).alias("_i"),
        "_lt",
    ).select(*keep, F.col("_lt").substr(F.col("_i"), F.lit(n)).alias("gram"))


def train_char_trigram_model(
    reference_docs: DataFrame, text_col: str = "text"
) -> dict:
    """Train on a trusted corpus → {'tri': DataFrame(ctx, nxt, n_tri),
    'bi': DataFrame(ctx, n_ctx), 'vocab_size': V}. Two aggregates, both
    keyed on strings of length ≤ 3 — partial aggregation collapses them
    map-side, so the shuffle is O(distinct ngrams), not O(corpus)."""
    # ONE corpus pass, not three: explode every char position once and
    # cut the (up to) 3-char gram there — substr past the end simply
    # truncates, so the position-i gram IS the trigram when i ≤ len−2,
    # the tail bigram at i = len−1, and the tail char at i = len. From
    # one gram-count aggregate (model-scale: ≤ charset³ + charset² +
    # charset rows) all three model surfaces derive with EXACTLY the
    # original counts: length-3 grams are the trigram counts, summing
    # counts of grams with length ≥ 2 by their 2-char prefix reproduces
    # the bigram counts (each position i ≤ len−1 contributes its bigram
    # as that prefix exactly once), and distinct first chars are the
    # vocab. The eager vocab count doubles as the persist() fault-in, so
    # tri/bi are then cheap re-aggregates of the persisted model-scale
    # frame instead of two more corpus explodes — measured 3.7-6.0 s →
    # ~1.5 s on the sf0.1 pipeline quality stage (guide §1.2: remove
    # whole passes before tuning inside one).
    lowered = F.lower(F.col(text_col))
    base = reference_docs.select(lowered.alias("_lt")).where(F.length("_lt") >= 1)
    grams = base.select(
        F.explode(F.sequence(F.lit(1), F.length("_lt"))).alias("_i"), "_lt"
    ).select(F.col("_lt").substr(F.col("_i"), F.lit(3)).alias("gram"))
    gcounts = grams.groupBy("gram").agg(F.count("*").alias("n")).persist()
    tri = gcounts.where(F.length("gram") == 3).select(
        F.substring("gram", 1, 2).alias("ctx"),
        F.substring("gram", 3, 1).alias("nxt"),
        F.col("n").alias("n_tri"),
    )
    bi = (
        gcounts.where(F.length("gram") >= 2)
        .groupBy(F.substring("gram", 1, 2).alias("ctx"))
        .agg(F.sum("n").alias("n_ctx"))
    )
    vocab = gcounts.select(F.substring("gram", 1, 1)).distinct().count()
    # gram_counts rides along so callers that tear a model down can
    # unpersist the backing frame (the model frames themselves are the
    # public surface; this is charset³-bounded bookkeeping)
    return {"tri": tri, "bi": bi, "vocab_size": int(vocab or 1), "gram_counts": gcounts}


def score_documents(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize_unit: int | None = None,
) -> DataFrame:
    """``docs`` + ``lm_logprob_e6`` (avg log P per trigram × 10⁶;
    higher = more reference-like) and ``lm_trigrams`` (how much evidence
    the score rests on — callers should gate very short docs
    themselves). Docs with no trigrams score NULL.

    ``quantize_unit``: when set, each trigram's log-prob is floored to an
    integer grid (``floor(lp · unit)``) BEFORE aggregation and the output
    column is ``lm_logprob_q`` = the exact integer SUM of quantized
    log-probs. Integer summation is order-independent, so the score is
    bit-identical across engines, partitionings and reruns — the form the
    DuckDB-oracle gate and resumable exports hash-check. (The default
    float average is fine for filtering; it is just not a cross-engine
    hash target: float addition is order-sensitive and ``log`` is not
    IEEE-correctly-rounded.)"""
    from zombi_spark.operators.skew import spread_narrow_scan

    V = model["vocab_size"]
    # §2.5 input-skew guard: checkpointed pipeline stages re-read as one
    # or two coalesced partitions, so the trigram explode + model joins
    # would run on a sliver of the session's cores; keyed on id_col the
    # exchange is reused by the per-doc aggregate below (no-op when the
    # input already has real splits)
    docs = spread_narrow_scan(docs, id_col)
    per_tri = exploded_char_ngrams(
        docs, F.lower(F.col(text_col)), 3, id_col
    ).select(
        id_col,
        F.substring("gram", 1, 2).alias("ctx"),
        F.substring("gram", 3, 1).alias("nxt"),
    )
    # add-one smoothing; unseen context backs off to 1/V. The ratio is an
    # exact IEEE division of two integers, so both engines log() the same
    # double.
    lp = F.log(
        (F.coalesce(F.col("n_tri"), F.lit(0)) + 1)
        / (F.coalesce(F.col("n_ctx"), F.lit(0)) + F.lit(V))
    )
    if quantize_unit is not None:
        lp = F.floor(lp * F.lit(quantize_unit)).cast("long")
    joined = per_tri.join(F.broadcast(model["tri"]), ["ctx", "nxt"], "left").join(
        F.broadcast(model["bi"]), "ctx", "left"
    ).select(id_col, lp.alias("lp"))
    if quantize_unit is not None:
        scores = joined.groupBy(id_col).agg(
            F.sum("lp").alias("lm_logprob_q"),
            F.count("*").alias("lm_trigrams"),
        )
    else:
        scores = joined.groupBy(id_col).agg(
            F.floor(F.avg("lp") * 1_000_000).cast("long").alias("lm_logprob_e6"),
            F.count("*").alias("lm_trigrams"),
        )
    return docs.join(scores, id_col, "left")


def perplexity_filter(
    docs: DataFrame,
    model: dict,
    min_logprob_e6: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep docs at/above the log-prob floor (CCNet keeps the best
    perplexity tail; the floor is the knob). Unscorable docs (< 3
    chars) are dropped — no evidence either way, and the reference
    pipelines discard them on length grounds anyway."""
    return (
        score_documents(docs, model, text_col, id_col)
        .where(F.col("lm_logprob_e6") >= min_logprob_e6)
    )
