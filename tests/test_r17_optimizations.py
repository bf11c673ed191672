"""Round-17 optimization pins: scale-safety hardenings and rewrites from
the second optimization round, each proving the fast/guarded path computes
exactly what the reference shape computed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zombi_spark.operators import skew
from zombi_spark.operators.similarity import brute_force_topk
from zombi_spark.operators.skew import spread_narrow_scan


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"doc {i} text body") for i in range(40)], "doc_id long, text string"
    )


def test_spread_narrow_scan_byte_ceiling_skips_shuffle(spark, sf_dir, monkeypatch):
    """A file scan whose optimized-plan size estimate is at/over
    parallelism x maxPartitionBytes must come back untouched (identity)
    WITHOUT the RDD partition probe — a huge scan is never round-tripped
    through a shuffle purely for width. (Needs a parquet scan: in-memory
    frames report the unknown-size sentinel and fall through to the
    probe.)"""
    from zombi_spark.sources.tables import load_table

    narrow = load_table(spark, sf_dir, "documents").coalesce(1)
    assert skew._plan_size_bytes(narrow)  # real file-based estimate
    # simulate "huge scan": shrink the ceiling below any real estimate
    monkeypatch.setattr(skew, "_max_partition_bytes", lambda s: 1)

    def _boom(df):  # the probe must not run once the ceiling trips
        raise AssertionError("RDD probe ran despite byte ceiling")

    monkeypatch.setattr(skew, "_scan_partitions", _boom)
    assert spread_narrow_scan(narrow, "doc_id") is narrow


def test_spread_narrow_scan_unknown_stats_fall_through_to_probe(spark, monkeypatch):
    """In-memory frames (LogicalRDD) report the Long.MaxValue unknown
    sentinel — the guard must NOT mistake that for a huge scan: it falls
    through to the precise probe and still rescues a narrow frame."""
    narrow = _docs(spark).coalesce(1)
    assert skew._plan_size_bytes(narrow) is None
    monkeypatch.setattr(skew, "_max_partition_bytes", lambda s: 1)
    par = spark.sparkContext.defaultParallelism
    assert spread_narrow_scan(narrow, "doc_id").rdd.getNumPartitions() == par


def test_spread_narrow_scan_probe_is_memoized(spark):
    """The RDD partition probe runs once per (session, plan) — a second
    guard call on the same plan hits the cache."""
    narrow = _docs(spark).coalesce(1)
    skew._PROBE_CACHE.clear()
    spread_narrow_scan(narrow, "doc_id")
    assert len(skew._PROBE_CACHE) == 1
    # second call over the same plan: cache hit, no new RDD probe
    cached = dict(skew._PROBE_CACHE)
    spread_narrow_scan(narrow, "doc_id")
    assert skew._PROBE_CACHE == cached


def test_spread_narrow_scan_still_fires_below_parallelism(spark):
    """The r16 contract is unchanged by the r17 probe rework."""
    par = spark.sparkContext.defaultParallelism
    docs = _docs(spark)
    spread = spread_narrow_scan(docs.coalesce(1), "doc_id")
    assert spread.rdd.getNumPartitions() == par
    wide = docs.repartition(par, "doc_id")
    assert spread_narrow_scan(wide, "doc_id") is wide
    assert sorted(map(tuple, spread.collect())) == sorted(map(tuple, docs.collect()))


def test_brute_force_topk_rejects_corpus_sized_query_frame(spark, monkeypatch):
    """The plan-time collect in the auto/Arrow branch is bounded: a query
    frame over the documented cap raises cleanly instead of collecting it
    to the driver."""
    from zombi_spark.operators import similarity

    monkeypatch.setattr(similarity, "_BRUTE_QUERY_ROW_CAP", 50)
    big = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.5)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="query frame exceeds"):
        brute_force_topk(big, big, k=3)


def test_contamination_scores_filter_first_matches_distinct_index_reference(spark):
    """r17 rewrite: broadcast-filter the raw gram slots before the
    per-doc distinct (no corpus-scale dedup shuffle). Must be
    row-identical to the r16 shape (distinct shingle index on both sides
    joined on shingle) — duplicates inside docs, multi-item shared
    shingles, and sub-n docs included."""
    from zombi_spark.operators import decontaminate as DC
    from zombi_spark.operators.dedup import shingle_index

    docs = spark.createDataFrame(
        [
            (1, "a b c d e a b c d e a b c d e"),  # internal repetition
            (2, "a b c d e"),                        # exactly n tokens
            (3, "x y z"),                            # sub-n: no shingles
            (4, "a b c d e f g h i j"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(101, "a b c d e f"), (102, "a b c d e"), (103, "q r s t u")],
        "bench_id long, text string",
    )
    n = 5
    ref_doc_sh = shingle_index(docs, n=n).select("doc_id", "shingle")
    ref_bench_sh = shingle_index(bench, n=n, id_col="bench_id").select(
        "bench_id", "shingle"
    )
    ref_sizes = ref_bench_sh.groupBy("bench_id").agg(F.count("*").alias("_n_item"))
    ref = (
        ref_doc_sh.join(ref_bench_sh, "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("_n_shared"))
        .join(ref_sizes, "bench_id")
        .select(
            "doc_id",
            "bench_id",
            F.floor(F.lit(1000) * F.col("_n_shared") / F.col("_n_item"))
            .cast("long")
            .alias("containment_pm"),
        )
    )
    got = DC.contamination_scores(docs, bench, n=n)
    assert sorted(map(tuple, ref.collect())) == sorted(map(tuple, got.collect()))


def test_jaccard_verify_array_shape_matches_explode_join_reference(spark):
    """r17 rewrite: per-doc shingle arrays + codegen array_intersect must
    be row-identical (schema included) to the r16 exploded-shingle join
    shape — zero-overlap pairs absent, full overlap exact, sub-n docs
    never present, ids outside the pair set ignored."""
    from zombi_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),          # exact dup of 1
            (3, "c d e f g"),          # partial overlap with 1/2
            (4, "x y z w v"),          # no overlap with anything
            (5, "q"),                   # sub-n: no shingles
            (6, "a b a b a b"),        # repeated grams
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (2, 6), (3, 6)], "id_a long, id_b long"
    )
    idx = D.shingle_index(docs, n=2)
    got = D.jaccard_verify(docs, pairs, shingle_n=2, shingles=idx, persist_candidates=False)

    # reference: the r16 exploded-shingle join formulation
    ids = pairs.select(F.col("id_a").alias("doc_id")).union(pairs.select("id_b")).distinct()
    cand = idx.join(ids, "doc_id", "left_semi")
    sizes = cand.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    ia = cand.select(F.col("doc_id").alias("id_a"), "shingle")
    ib = cand.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        pairs.join(ia, "id_a").join(ib, ["id_b", "shingle"])
        .groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    n_union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ref = (
        inter.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b", "n_inter", n_union.alias("n_union"),
            F.floor(F.lit(1000) * F.col("n_inter") / n_union).cast("long").alias("jaccard_pm"),
        )
    )
    assert got.schema == ref.schema
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
    # the planted edges behave: exact dup = 1000 pm, disjoint pair absent
    rows = {(r.id_a, r.id_b): r.jaccard_pm for r in got.collect()}
    assert rows[(1, 2)] == 1000
    assert (1, 4) not in rows and (1, 5) not in rows


def test_fastjson_fallback_bytes_match_orjson():
    """The stdlib fallback must emit byte-identical documents to the
    orjson fast path for zombi's metadata shapes, and reject the shapes
    orjson rejects (tuples, non-str keys) instead of silently coercing."""
    import json

    orjson = pytest.importorskip("orjson")
    from zombi_spark.table.fastjson import _assert_contract

    doc = {
        "format-version": 2,
        "snapshots": [
            {"id": 7, "files": ["a.parquet", "b.parquet"], "rows": 123, "live": True},
            {"id": 8, "files": [], "rows": 0, "live": False, "note": None},
        ],
        "unicode": "héllo — ünïcode",
    }
    fast = orjson.dumps(doc, option=orjson.OPT_INDENT_2)
    slow = json.dumps(doc, indent=2, ensure_ascii=False, allow_nan=False).encode("utf-8")
    assert fast == slow
    with pytest.raises(TypeError, match="tuple"):
        _assert_contract({"files": ("a", "b")})
    with pytest.raises(TypeError, match="non-str"):
        _assert_contract({1: "x"})


def test_brute_force_topk_null_query_id_matches_column_path(spark):
    """A query row with a NULL id emits no rows on the Column path (NULL
    join condition); the Arrow kernel branch must agree instead of
    raising."""
    import random

    rng = random.Random(17)
    rows = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(6)]) for i in range(60)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qrows = [(None, [0.5] * 6)] + rows[:40]
    queries = spark.createDataFrame(qrows, "vec_id long, embedding array<double>")
    col = brute_force_topk(corpus, queries, k=4, use_arrow=False)
    arw = brute_force_topk(corpus, queries, k=4, use_arrow=True)
    assert col.schema == arw.schema
    assert sorted(map(tuple, col.collect())) == sorted(map(tuple, arw.collect()))


def test_simhash_near_dup_bucket_arrays_match_self_join_reference(spark):
    """The grouped-bucket pair generation must reproduce exactly the pair
    set of the reference self-join shape (all ordered id_a < id_b pairs
    sharing a chunk bucket, hamming-filtered, distinct) — including
    multi-chunk collisions (exact dups agree on every chunk), planted
    near-dups, and singleton buckets."""
    from zombi_spark.operators.dedup import simhash, simhash_near_dup

    rows = []
    for i in range(120):
        base = " ".join(f"w{i}_{j}" for j in range(30))
        rows.append((i, base))
        if i % 10 == 0:  # exact duplicate: hamming 0, collides on EVERY chunk
            rows.append((i + 1000, base))
        if i % 7 == 0:  # near duplicate: a couple of tokens changed
            rows.append((i + 2000, base.replace(f"w{i}_3", "X").replace(f"w{i}_9", "Y")))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = sorted(map(tuple, simhash_near_dup(docs, bits=16, max_hamming=3).collect()))

    # reference: the pre-r17 self-join shape, inlined
    bits, max_hamming = 16, 3
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    sh = simhash(docs, bits=bits, id_col="doc_id")
    chunked = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("chunk"),
    ).withColumn(
        "chunk_val",
        F.expr(f"shiftright(simhash, chunk * {chunk_bits}) & {(1 << chunk_bits) - 1}"),
    )
    a = chunked.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "chunk_val"
    )
    b = chunked.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "chunk_val"
    )
    want = sorted(
        map(
            tuple,
            a.join(b, ["chunk", "chunk_val"])
            .where(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b", F.expr("bit_count(sh_a ^ sh_b)").cast("int").alias("hamming")
            )
            .where(F.col("hamming") <= max_hamming)
            .distinct()
            .collect(),
        )
    )
    assert got == want and len(got) > 0
