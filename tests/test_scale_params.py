"""Scale-parameterized LSH/simhash defaults: bucket sizing derived from
corpus size, not demo constants (the 100×-scale knobs the fixed defaults
were hiding — sign-LSH 16 buckets, simhash 4-bit chunks)."""

import pyspark.sql.functions as F

from zombi_spark.operators.dedup import simhash, simhash_bits_for, simhash_near_dup
from zombi_spark.operators.similarity import (
    derive_lsh_dims,
    lsh_planes_for,
    sign_lsh_bucket,
)
from zombi_spark.sources.tables import load_table

SF01 = "/root/testdata/sf0.1"


def test_lsh_planes_scale_with_corpus():
    # demo corpus → the 4-plane floor; growth is logarithmic; capped at 30
    assert len(lsh_planes_for(1_000, 64)) == 4
    assert len(lsh_planes_for(1_000_000, 64)) == 10
    assert len(lsh_planes_for(1_000_000_000, 64)) == 20
    assert len(lsh_planes_for(10**15, 64)) == 30
    # bucket count keeps expected population ≤ ~target for any corpus
    for n in (10**4, 10**6, 10**9):
        planes = lsh_planes_for(n, 64, target_bucket_size=1024)
        assert n / 2 ** len(planes) <= 1024
    # planes are valid 1-based indices into the vector, unique
    planes = lsh_planes_for(10**9, 64)
    assert all(1 <= d <= 64 for d in planes) and len(set(planes)) == len(planes)


def test_simhash_bits_scale_with_corpus():
    assert simhash_bits_for(500) == 16  # 4-bit chunks × 4 — old default
    assert simhash_bits_for(1_000_000) == 40  # 10-bit chunks
    assert simhash_bits_for(10**12) == 60  # capped: stays inside a long
    for n in (10**4, 10**6, 10**9):
        bits = simhash_bits_for(n, max_hamming=3, target_bucket_size=1024)
        chunk_bits = bits // 4
        assert n / 2**chunk_bits <= 1024 or chunk_bits == 15


def test_derived_lsh_buckets_bound_pairgen_at_sf01(spark):
    """At sf0.1, auto-derived planes must keep every sign-LSH bucket small
    enough that within-bucket pair generation is far below all-pairs."""
    emb = load_table(spark, SF01, "embeddings")
    n = emb.count()
    dims = derive_lsh_dims(emb, "embedding")
    sizes = (
        emb.select(sign_lsh_bucket(F.col("embedding"), dims).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    max_bucket = max(r["count"] for r in sizes)
    # real embeddings are not uniform across sign patterns; assert the
    # useful property: within-bucket pairs ≪ all pairs (≥8× reduction)
    pairs_bucketed = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)
    pairs_all = n * (n - 1) // 2
    assert pairs_bucketed * 8 <= pairs_all
    assert max_bucket < n


def test_auto_bits_simhash_matches_fixed_at_demo_scale(spark):
    """bits=None derives 16 at sf0.001 (≤ target corpus) — identical
    output to the fixed default, so the auto path is a superset."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    fixed = simhash_near_dup(docs, bits=16).orderBy("id_a", "id_b").collect()
    auto = simhash_near_dup(docs, bits=None).orderBy("id_a", "id_b").collect()
    assert fixed == auto


def test_bits_monotone_nondecreasing():
    prev = 0
    for exp in range(3, 13):
        b = simhash_bits_for(10**exp)
        assert b >= prev
        prev = b
    prev = 0
    for exp in range(3, 13):
        p = len(lsh_planes_for(10**exp, 64))
        assert p >= prev
        prev = p


def test_simhash_packed_lanes_match_naive_votes(spark):
    """The r10 packed-lane simhash (two 32-bit set-counters per sum lane,
    no tokens×bits explode) must reproduce the ±1-vote definition exactly.
    bits=21 (odd, > 2×⌈21/2⌉−1) exercises the lane-tail branch where the
    high lane of the last sum columns is absent."""
    import hashlib

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "zeta eta theta"),
        (4, "solo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for bits in (16, 21, 32):
        got = {
            r["doc_id"]: r["simhash"]
            for r in simhash(docs, bits=bits).collect()
        }
        for doc_id, text in rows:
            toks = sorted(set(text.split(" ")))
            want = 0
            for j in range(bits):
                vote = 0
                for t in toks:
                    h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                    vote += 1 if (h >> j) & 1 else -1
                if vote > 0:
                    want |= 1 << j
            assert got[doc_id] == want, (bits, doc_id)


def test_simhash_query_calibration_at_sf01(spark):
    """VERDICT r7 #4 / r9 #1: q_simhash_near_dup's target_bucket_size=32
    must actually engage — at sf0.1 (5,000 docs) the derived width is
    32 bits (8-bit chunks), and the planted near-dups (doc_id + 1e6,
    last two tokens dropped) must DOMINATE the output instead of the
    random hamming-≤3 collision tail the 16-bit width produced
    (measured: 83 planted / 105 total = 0.79)."""
    from zombi_spark.plans.pipeline_queries import q_simhash_near_dup

    assert simhash_bits_for(5_000, max_hamming=3, target_bucket_size=32) == 32
    # the oracle scales stay at the pinned 16-bit width (4-bit floor)
    assert simhash_bits_for(500, max_hamming=3, target_bucket_size=32) == 16
    rows = q_simhash_near_dup(spark, SF01).collect()
    planted = sum(1 for r in rows if r["id_b"] == r["id_a"] + 1_000_000)
    assert rows, "empty pair set"
    assert planted / len(rows) >= 0.5
    # recall on the planted family (100 planted docs at sf0.1)
    assert planted >= 50


def test_semdedup_cells_scale_with_corpus():
    from zombi_spark.operators.similarity import semdedup_cells_for

    assert semdedup_cells_for(500) == 8          # floor
    assert semdedup_cells_for(8192) == 8
    assert semdedup_cells_for(1_000_000) == 977  # ~n/target
    assert semdedup_cells_for(10_000_000) == 9766
    # monotone, and cell population stays bounded: n/C <= target always
    prev = 0
    for n in (1_000, 10_000, 100_000, 1_000_000, 10_000_000):
        c = semdedup_cells_for(n)
        assert c >= prev
        assert n / c <= 1024 or c == 8
        prev = c
