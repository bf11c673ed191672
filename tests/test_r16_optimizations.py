"""Round-16 optimization pins: each rewrite that changed an operator's
internals for speed gets a test proving the fast path computes EXACTLY
what the slow reference shape computed (the optimization contract — same
rows, not just same aggregate shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zombi_spark.operators.dedup import exploded_shingles, with_shingles
from zombi_spark.operators.lm_quality import (
    exploded_char_ngrams,
    score_documents,
    train_char_trigram_model,
)
from zombi_spark.operators.skew import spread_narrow_scan

EDGE_TEXTS = [
    (1, "a b c d e f g"),
    (2, "one two"),
    (3, "single"),
    (4, ""),
    (5, "  leading and  double  spaces "),
    (6, "répé titi on répé titi on répé"),
    (7, "x " * 40 + "tail"),
]


def _docs(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")


def test_exploded_shingles_matches_exploded_with_shingles(spark):
    """exploded_shingles (codegen gram cut) must be row-identical —
    duplicates, order-within-doc slots, and edge texts included — to
    exploding the array-building reference."""
    docs = _docs(spark)
    for n in (1, 2, 3, 8):
        if n == 1:
            # exploded_shingles targets n >= 2 consumers; with_shingles
            # short-circuits n=1 to the raw token array
            continue
        ref = (
            with_shingles(docs, n=n)
            .select("doc_id", F.explode("shingles").alias("gram"))
            .collect()
        )
        fast = exploded_shingles(docs, n=n).collect()
        assert sorted(map(tuple, ref)) == sorted(map(tuple, fast)), f"n={n}"


def test_one_pass_trigram_model_matches_three_pass_reference(spark):
    """The single-explode trigram/bigram/vocab derivation must reproduce
    the original three-pass counts exactly (they feed add-one smoothing:
    one off-by-one anywhere changes scores)."""
    docs = _docs(spark)
    lowered = F.lower(F.col("text"))
    ref_tri = {
        (r["ctx"], r["nxt"]): r["n_tri"]
        for r in exploded_char_ngrams(docs, lowered, 3)
        .groupBy("gram")
        .agg(F.count("*").alias("n_tri"))
        .select(
            F.substring("gram", 1, 2).alias("ctx"),
            F.substring("gram", 3, 1).alias("nxt"),
            "n_tri",
        )
        .collect()
    }
    ref_bi = {
        r["ctx"]: r["n_ctx"]
        for r in exploded_char_ngrams(docs, lowered, 2)
        .groupBy("gram")
        .agg(F.count("*").alias("n_ctx"))
        .withColumnRenamed("gram", "ctx")
        .collect()
    }
    ref_vocab = (
        exploded_char_ngrams(docs, lowered, 1).agg(F.countDistinct("gram")).first()[0]
    )

    model = train_char_trigram_model(docs)
    got_tri = {(r["ctx"], r["nxt"]): r["n_tri"] for r in model["tri"].collect()}
    got_bi = {r["ctx"]: r["n_ctx"] for r in model["bi"].collect()}
    assert got_tri == ref_tri
    assert got_bi == ref_bi
    assert model["vocab_size"] == int(ref_vocab)
    model["gram_counts"].unpersist()


def test_score_documents_spread_guard_changes_no_rows(spark):
    """score_documents now spreads narrow inputs before the explode; the
    scores must not depend on partitioning."""
    docs = _docs(spark)
    model = train_char_trigram_model(docs)
    one = score_documents(docs.coalesce(1), model, quantize_unit=1000).collect()
    many = score_documents(docs.repartition(8), model, quantize_unit=1000).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
    model["gram_counts"].unpersist()


def test_spread_narrow_scan_fires_only_below_parallelism(spark):
    par = spark.sparkContext.defaultParallelism
    docs = _docs(spark)
    narrow = docs.coalesce(1)
    spread = spread_narrow_scan(narrow, "doc_id")
    assert spread.rdd.getNumPartitions() == par
    # already-wide input comes back untouched (identity, no added shuffle)
    wide = docs.repartition(par, "doc_id")
    assert spread_narrow_scan(wide, "doc_id") is wide
    # rows unchanged either way
    assert sorted(map(tuple, spread.collect())) == sorted(map(tuple, docs.collect()))


def test_brute_force_topk_arrow_kernel_matches_column_path(spark):
    """The Q>=32 Arrow GEMM path must be bit-identical to the Column
    HOF path — including NULL vectors, the zero-vector NULL cosine,
    ties, and self-exclusion."""
    import random

    from zombi_spark.operators.similarity import brute_force_topk

    rng = random.Random(16)
    rows = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(8)]) for i in range(200)]
    rows[7] = (7, [0.0] * 8)  # zero vector
    rows[11] = (11, None)  # null vector
    rows[13] = (13, rows[12][1])  # exact tie pair
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where("vec_id < 40")  # 40 >= _IVF_ARROW_MIN_CELLS
    col = brute_force_topk(corpus, queries, k=6, use_arrow=False)
    arw = brute_force_topk(corpus, queries, k=6, use_arrow=True)
    assert col.schema == arw.schema
    assert sorted(map(tuple, col.collect())) == sorted(map(tuple, arw.collect()))
    # the auto gate: small query sets stay on the Column path (no
    # MapInPandas node), large ones switch
    small_auto = brute_force_topk(corpus, queries.where("vec_id < 8"), k=3)
    assert "mapInPandas" not in small_auto._jdf.queryExecution().analyzed().toString()
