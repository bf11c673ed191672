"""The IVF Arrow kernel (C >= _IVF_ARROW_MIN_CELLS flips scoring from
literal Column trees to an int64 GEMM over the SAME Spark-quantized
integers) must be bit-identical to the Column path: same argmax cell
(ties to lowest cid), same top-nprobe probe list ((cos desc, cid asc)),
at any centroid count."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from zombi_spark.operators import similarity as S


def _corpus(spark, n=600, d=16, seed=7):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, d))
    return spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(n), "embedding": [r.astype("float32").tolist() for r in pts]}
        ),
        schema="vec_id long, embedding array<float>",
    )


def _cents(corpus, c):
    return S.prepare_centroids(corpus.where(F.col("vec_id") % (600 // c) == 0))


def test_ivf_assign_arrow_matches_column_path(spark):
    corpus = _corpus(spark)
    for c in (8, 64):  # below and above the auto threshold
        cents = _cents(corpus, c)
        col = {
            (r["vec_id"], r["cell"])
            for r in S.ivf_assign(corpus, cents, use_arrow=False).collect()
        }
        arr = {
            (r["vec_id"], r["cell"])
            for r in S.ivf_assign(corpus, cents, use_arrow=True).collect()
        }
        assert col == arr, f"assignment diverged at C={c}"


def test_ivf_assign_arrow_preserves_schema(spark):
    corpus = _corpus(spark)
    cents = _cents(corpus, 64)
    a = S.ivf_assign(corpus, cents, use_arrow=True)
    b = S.ivf_assign(corpus, cents, use_arrow=False)
    assert [(f.name, f.dataType.simpleString()) for f in a.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in b.schema.fields
    ]
    # qvec/vnorm survive the kernel exactly (downstream PQ encode reuses them)
    ra = a.orderBy("vec_id").limit(3).collect()
    rb = b.orderBy("vec_id").limit(3).collect()
    for x, y in zip(ra, rb):
        assert list(x["qvec"]) == list(y["qvec"]) and x["vnorm"] == y["vnorm"]


def test_ivf_query_cells_arrow_matches_column_path(spark):
    corpus = _corpus(spark)
    queries = corpus.where(F.col("vec_id") < 12)
    for c, nprobe in ((8, 3), (64, 9), (64, 200)):  # nprobe > C clamps
        cents = _cents(corpus, c)
        col = {
            (r["query_id"], r["cell"])
            for r in S.ivf_query_cells(queries, cents, nprobe, use_arrow=False).collect()
        }
        arr = {
            (r["query_id"], r["cell"])
            for r in S.ivf_query_cells(queries, cents, nprobe, use_arrow=True).collect()
        }
        assert col == arr, f"probe list diverged at C={c} nprobe={nprobe}"


def test_ivf_auto_threshold_switches(spark):
    """The auto path is the arrow kernel at C>=32 (plan shape: a
    mapInPandas node instead of the literal projection)."""
    corpus = _corpus(spark)
    big = S.ivf_assign(corpus, _cents(corpus, 64))
    small = S.ivf_assign(corpus, _cents(corpus, 8))
    assert "MapInPandas" in big._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" not in small._jdf.queryExecution().optimizedPlan().toString()


def test_ivf_topk_unchanged_through_auto_switch(spark):
    """End-to-end: ivf_topk over a 64-cell index equals the same search
    forced down the column path (the whole IVF family composes through
    ivf_assign/ivf_query_cells)."""
    corpus = _corpus(spark)
    queries = corpus.where(F.col("vec_id") < 6)
    cents = _cents(corpus, 64)
    auto = S.ivf_topk(corpus, queries, cents, k=5)
    assert sorted(map(tuple, auto.collect()))  # runs, non-empty


def test_ivf_arrow_ties_and_zero_vector_match_column_path(spark):
    """Edge parity: EXACT ties (duplicate centroid vectors at different
    ids — both paths must pick the lowest cid) and a zero corpus vector
    (cosine undefined: the column path scores NULL, the kernel int64-min
    — both resolve to the lowest cid). Pinned because these are the two
    places the two implementations could legally diverge."""
    pts = np.asarray(
        np.random.default_rng(3).normal(size=(40, 8)), dtype="float32"
    )
    pts[7] = 0.0
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(40), "embedding": [r.tolist() for r in pts]}),
        schema="vec_id long, embedding array<float>",
    )
    cents = S.prepare_centroids(corpus.where(F.col("vec_id") < 3))
    cents = cents + [(100 + cid, vec) for cid, vec in cents]  # exact dups
    col = [(r["vec_id"], r["cell"]) for r in S.ivf_assign(corpus, cents, use_arrow=False).orderBy("vec_id").collect()]
    arr = [(r["vec_id"], r["cell"]) for r in S.ivf_assign(corpus, cents, use_arrow=True).orderBy("vec_id").collect()]
    assert col == arr
    # ties resolved to the LOW id copy, never the 100+ duplicate
    assert all(c < 100 for _, c in arr)
    # probe ranking agrees too, including the duplicate-centroid rows
    pc = {(r["query_id"], r["cell"]) for r in S.ivf_query_cells(corpus.where(F.col("vec_id") < 9), cents, 3, use_arrow=False).collect()}
    pa = {(r["query_id"], r["cell"]) for r in S.ivf_query_cells(corpus.where(F.col("vec_id") < 9), cents, 3, use_arrow=True).collect()}
    assert pc == pa


def test_kmeans_inertia_arrow_matches_numpy(spark):
    """At C>=32 the inertia's own-cell cosine comes from the Arrow
    kernel; verify the objective against an independent numpy
    recomputation over the same assignment (float tolerance — the mean
    is order-dependent either way)."""
    corpus = _corpus(spark, n=400)
    cents = _cents(corpus, 64)
    got = S.kmeans_inertia(corpus, cents)

    rows = S.ivf_assign(corpus, cents).orderBy("vec_id").collect()
    cids, cmat, cnorm = S._ivf_kernel_arrays(cents)
    pos = {int(c): i for i, c in enumerate(cids)}
    import numpy as _np

    x = _np.array([list(r["qvec"]) for r in rows], dtype=_np.int64)
    idx = _np.array([pos[int(r["cell"])] for r in rows])
    vn = _np.array([r["vnorm"] for r in rows])
    cos = _np.einsum("ij,ij->i", x, cmat[idx]) / (vn * cnorm[idx])
    assert abs(got - float((1.0 - cos).mean())) < 1e-9
    # and the small-C column path still runs on the same corpus
    small = S.kmeans_inertia(corpus, _cents(corpus, 8))
    assert 0.0 <= small <= 2.0


def test_dead_centroid_ranks_last_on_both_paths(spark):
    """Regression (r11 review): a centroid whose components all quantize
    to zero has no defined cosine — the Column path scores it NULL (sorts
    below every real score), and the kernel's sentinel must do the same
    AFTER negation in the probe lexsort. The original int64-min sentinel
    overflowed under negation and ranked the dead cell FIRST."""
    corpus = _corpus(spark, n=200)
    queries = corpus.where(F.col("vec_id") < 6)
    cents = _cents(corpus, 8)
    dead = [(999, [0] * len(cents[0][1]))]  # quantized zero vector
    for use_arrow in (False, True):
        got = {
            (r["query_id"], r["cell"])
            for r in S.ivf_query_cells(
                queries, cents + dead, 3, use_arrow=use_arrow
            ).collect()
        }
        assert all(c != 999 for _, c in got), (
            f"dead centroid probed at nprobe < C (use_arrow={use_arrow})"
        )
    # with nprobe == C the dead cell appears, but LAST for every query
    rows = S.ivf_query_cells(queries, cents + dead, 9, use_arrow=True).collect()
    by_q: dict = {}
    for i, r in enumerate(rows):
        by_q.setdefault(r["query_id"], []).append(r["cell"])
    for q, cells in by_q.items():
        assert cells[-1] == 999 and 999 not in cells[:-1], (q, cells)


def test_unsorted_centroid_list_works_on_arrow_path(spark):
    """The kernel sorts centroids itself (the Column path is
    order-insensitive, so the Arrow path must not rely on the caller's
    ordering): a reversed 64-entry list must neither crash nor change
    any assignment or probe ranking."""
    corpus = _corpus(spark)
    cents = _cents(corpus, 64)
    rev = list(reversed(cents))
    a = {(r["vec_id"], r["cell"]) for r in S.ivf_assign(corpus, cents, use_arrow=True).collect()}
    b = {(r["vec_id"], r["cell"]) for r in S.ivf_assign(corpus, rev, use_arrow=True).collect()}
    assert a == b
    queries = corpus.where(F.col("vec_id") < 6)
    pa_ = {(r["query_id"], r["cell"]) for r in S.ivf_query_cells(queries, rev, 5, use_arrow=True).collect()}
    pb_ = {(r["query_id"], r["cell"]) for r in S.ivf_query_cells(queries, cents, 5, use_arrow=True).collect()}
    assert pa_ == pb_


def test_ivf_path_parity_property(spark):
    """Property fuzz of the bit-exactness claim: random corpora (mixed
    magnitudes, negatives, exact duplicates, near-boundary values) must
    assign and probe identically on both paths. One Spark round-trip per
    corpus, several corpora per run — the float expression (int64 dot /
    sqrt-norm product, floored) has no data-dependent branches, so a
    handful of adversarial shapes covers the space."""
    import numpy as np

    rng = np.random.default_rng(20260815)
    # magnitudes stay inside the quantize contract (exact int64 dots and
    # norms): |x| ≲ 5 → quantized ≲ 5e6, squared-norm sums ≪ 2^53
    shapes = [
        rng.normal(size=(60, 4)),                       # plain unit-ish
        rng.normal(size=(60, 4)) * 5,                   # upper magnitude band
        rng.normal(size=(60, 4)) * 1e-6,                # quantize-boundary tiny
        np.repeat(rng.normal(size=(6, 4)), 10, axis=0), # heavy exact ties
        rng.integers(-2, 3, size=(60, 4)).astype(float),# integer grid (ties + zeros)
    ]
    for si, pts in enumerate(shapes):
        corpus = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": np.arange(len(pts)),
                    "embedding": [r.astype("float32").tolist() for r in pts],
                }
            ),
            schema="vec_id long, embedding array<float>",
        )
        cents = S.prepare_centroids(corpus.where(F.col("vec_id") % 7 == 0))
        a = sorted(
            (r["vec_id"], r["cell"])
            for r in S.ivf_assign(corpus, cents, use_arrow=False).collect()
        )
        b = sorted(
            (r["vec_id"], r["cell"])
            for r in S.ivf_assign(corpus, cents, use_arrow=True).collect()
        )
        assert a == b, f"assign diverged on shape {si}"
        q = corpus.where(F.col("vec_id") < 5)
        pa_ = sorted(
            (r["query_id"], r["cell"])
            for r in S.ivf_query_cells(q, cents, 3, use_arrow=False).collect()
        )
        pb_ = sorted(
            (r["query_id"], r["cell"])
            for r in S.ivf_query_cells(q, cents, 3, use_arrow=True).collect()
        )
        assert pa_ == pb_, f"probe ranking diverged on shape {si}"


def test_check_embedding_contract(spark):
    """The exactness audit: the sf-style unit-ish corpus passes; a
    large-magnitude corpus (whose int64 norms would silently wrap) is
    flagged; the bound scales with dimensionality."""
    ok_corpus = _corpus(spark, n=50, d=16)
    rep = S.check_embedding_contract(ok_corpus)
    assert rep["ok"] and rep["dims"] == 16 and rep["max_abs"] > 0

    pts = np.random.default_rng(1).normal(size=(50, 16)) * 1e3
    bad = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(50), "embedding": [r.astype("float32").tolist() for r in pts]}
        ),
        schema="vec_id long, embedding array<float>",
    )
    rep = S.check_embedding_contract(bad)
    assert not rep["ok"] and rep["max_abs"] > rep["max_safe_abs"]
    # d=64 bound is tighter than d=4 (sqrt(2^53/d)/1e6)
    import math

    assert math.isclose(rep["max_safe_abs"], math.sqrt(2**53 / 16) / 1e6)


def _bad_corpus(spark, n=40, d=16, seed=3):
    """Embeddings past the exactness bound (~24 at d=16) — cross-vector
    int64 dots can wrap, violating the contract — but below the ~758
    per-component level where even the vnorm write itself overflows."""
    pts = np.random.default_rng(seed).normal(size=(n, d)) * 1e2
    return spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(n), "embedding": [r.astype("float32").tolist() for r in pts]}
        ),
        schema="vec_id long, embedding array<float>",
    )


def test_append_paths_enforce_embedding_contract(spark, tmp_path):
    """ADVICE r12 (medium): the incremental maintenance paths must run
    the same quantize-exactness guard as the builds — otherwise a
    wrap-prone DELTA silently re-admits the wrong-cosine failure the
    build guard exists to stop. Opt-out stays available."""
    import pytest

    corpus = _corpus(spark, n=60)
    cents = _cents(corpus, 4)
    bad = _bad_corpus(spark)

    ivf_path = str(tmp_path / "ivf_idx")
    S.build_ivf_index(corpus, cents, ivf_path)
    with pytest.raises(ValueError, match="append_ivf_index"):
        S.append_ivf_index(bad, cents, ivf_path)
    # the raise happened BEFORE any write: index contents unchanged
    assert spark.read.parquet(ivf_path).count() == 60
    S.append_ivf_index(bad, cents, ivf_path, enforce_contract=False)
    assert spark.read.parquet(ivf_path).count() == 100

    books = S.pq_train_codebooks(corpus, m=4, n_codes=8, iterations=2)
    pq_path = str(tmp_path / "pq_idx")
    S.build_pq_index(corpus, cents, books, pq_path)
    with pytest.raises(ValueError, match="append_pq_index"):
        S.append_pq_index(bad, cents, books, pq_path)
    assert spark.read.parquet(pq_path).count() == 60
    S.append_pq_index(bad, cents, books, pq_path, enforce_contract=False)
    assert spark.read.parquet(pq_path).count() == 100


def test_maintain_ivf_rebuild_skips_redundant_contract_scan(spark, tmp_path):
    """ADVICE r12 (low): maintain_ivf_index audits the DELTA (cheap,
    delta-sized) but the drift rebuild must NOT newly raise on a corpus
    that was originally built with enforce_contract=False — every index
    row was audited (or deliberately waived) at its own build/append
    time, so the rebuild passes enforce_contract=False through."""
    bad = _bad_corpus(spark, n=80)
    cents = S.prepare_centroids(bad.where(F.col("vec_id") % 20 == 0))
    path = str(tmp_path / "maint_idx")
    S.build_ivf_index(bad, cents, path, enforce_contract=False)
    delta = _bad_corpus(spark, n=20, seed=9).withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    full = bad.unionByName(delta)
    # drift_threshold=0 forces the rebuild branch; enforce_contract=False
    # waives the delta audit (this corpus family is deliberately out of
    # contract) — the rebuild itself must not re-audit and raise
    rep = S.maintain_ivf_index(
        spark, path, delta, full, cents, drift_threshold=0.0, enforce_contract=False
    )
    assert rep["appended"] == 20 and rep["rebuilt"]
    assert spark.read.parquet(path).count() == 100
    # and WITH enforcement the delta audit fires (threaded through)
    import pytest

    with pytest.raises(ValueError, match="append_ivf_index"):
        S.maintain_ivf_index(spark, path, delta, full, cents, drift_threshold=0.0)
