"""Product quantization (encode / ADC / exact re-rank): integer-exact
kernel parity against a pure-numpy reference, deterministic training,
and recall gates on both the isotropic table and the planted-cluster
corpus (the bench recall recipe). The DuckDB hash-parity check of the
full pq_ann query runs in tests/test_oracle_parity.py."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from zombi_spark.operators import similarity as S
from zombi_spark.sources.tables import load_table

SF001 = "/root/testdata/sf0.01"


def _clustered_corpus(spark, n=2000, blobs=16, sigma=0.15):
    """The bench recall recipe at test scale: fixed-seed Gaussian blobs."""
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(blobs, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[np.arange(n) % blobs] + sigma * rng.normal(size=(n, 64))
    return spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(n), "embedding": [r.astype("float32").tolist() for r in pts]}
        ),
        schema="vec_id long, embedding array<float>",
    )


def _recall(brute_df, fast_df) -> float:
    truth: dict = {}
    got: dict = {}
    for r in brute_df.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in fast_df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    qs = sorted(truth)
    return sum(len(truth[q] & got.get(q, set())) / len(truth[q]) for q in qs) / len(qs)


def test_pq_codebook_vectors_encode_to_their_own_code(spark):
    """A codebook vector's subvectors ARE codewords, so its L2 distance
    to itself is 0 in every subspace — encode must return code c for
    vec_id 100+c across all m subspaces (exact-reconstruction fixpoint)."""
    emb = load_table(spark, SF001, "embeddings")
    books = S.prepare_pq_codebooks(emb)  # m=4, 16 codes, ids [100, 116)
    rows = (
        S.pq_encode(emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 116)), books)
        .orderBy("vec_id")
        .collect()
    )
    assert len(rows) == 16
    for r in rows:
        expect = int(r["vec_id"]) - 100
        assert list(r["codes"]) == [expect] * 4, r
        # recon_n2 == the vector's own quantized squared norm (exact)
        n2 = sum(
            sum(qc[i] * qc[i] for i in range(len(qc)))
            for qc in (book[expect][1] for book in books)
        )
        assert int(r["recon_n2"]) == n2


def test_pq_encode_matches_numpy_reference(spark):
    """The Arrow-batched kernel is int64 all the way down: codes and
    recon_n2 must equal an independent numpy recomputation over the same
    quantized integers — argmin(|c|^2 - 2 x.c), first minimum on ties."""
    emb = load_table(spark, SF001, "embeddings")
    books = S.prepare_pq_codebooks(emb)
    got = {
        int(r["vec_id"]): (list(r["codes"]), int(r["recon_n2"]))
        for r in S.pq_encode(emb, books).collect()
    }
    pdf = emb.orderBy("vec_id").toPandas()
    x = np.round(np.array(pdf["embedding"].tolist(), dtype=np.float64) * 1e6).astype(
        np.int64
    )
    m, sub = 4, 16
    for j in range(m):
        cb = np.array([qc for _c, qc in books[j]], dtype=np.int64)
        cn2 = (cb * cb).sum(1)
        xj = x[:, j * sub : (j + 1) * sub]
        ref_codes = (cn2[None, :] - 2 * (xj @ cb.T)).argmin(1)
        for i, vid in enumerate(pdf["vec_id"]):
            assert got[int(vid)][0][j] == int(ref_codes[i])
    # spot-check recon_n2 on a handful
    for vid in (0, 7, 123, 499):
        codes, recon = got[vid]
        expect = sum(
            sum(c * c for c in books[j][codes[j]][1]) for j in range(m)
        )
        assert recon == expect


def test_pq_training_is_deterministic(spark):
    # determinism (b1 == b2) holds at any corpus size — sized for suite
    # wall-clock, not coverage (r17)
    corpus = _clustered_corpus(spark, n=600)
    b1 = S.pq_train_codebooks(corpus, m=8, n_codes=32, iterations=2)
    b2 = S.pq_train_codebooks(corpus, m=8, n_codes=32, iterations=2)
    assert b1 == b2
    assert len(b1) == 8 and len(b1[0]) == 32 and len(b1[0][0][1]) == 8


def test_pq_search_recall_on_clustered_corpus(spark):
    """The quality gate: trained books (m=8, k=256) + exact re-rank must
    recover near-exact recall on the corpus shape ANN exists for
    (measured 0.95 at bench scale; ADC alone is ~0.35 — the re-rank is
    load-bearing)."""
    corpus = _clustered_corpus(spark, n=2000)
    queries = corpus.where(F.col("vec_id") < 8)
    brute = S.brute_force_topk(corpus, queries, k=5)
    pq = S.pq_search(corpus, queries, k=5)
    assert _recall(brute, pq) >= 0.85


def test_pq_search_recall_on_isotropic_table(spark):
    """Near-isotropic embeddings are the bucketed-ANN worst case, but
    PQ+re-rank scans ALL codes (no bucketing loss) — recall stays high
    (measured 1.0 at sf0.01)."""
    emb = load_table(spark, SF001, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    assert _recall(
        S.brute_force_topk(emb, queries, k=5), S.pq_search(emb, queries, k=5)
    ) >= 0.9


def test_pq_index_partition_pruned_search_matches_full_scan(spark, tmp_path):
    """The IVF×PQ composition (FAISS IVFPQ shape): at nprobe = C the
    indexed search must equal the full-scan pq_search with the same
    books EXACTLY; at nprobe = 1 the scan is partition-PRUNED to the
    probed cells (plan-asserted) and only those cells' codes are read."""
    import contextlib
    import io

    # pruned == full-scan equality holds at any corpus size — sized for
    # suite wall-clock, not coverage (r17)
    corpus = _clustered_corpus(spark, n=1000)
    queries = corpus.where(F.col("vec_id") < 8)
    books = S.pq_train_codebooks(corpus, m=8, n_codes=16, iterations=2)
    # centroids: the 16 lowest-id vectors, one per blob (ids 0..15 cycle
    # through the blobs by construction)
    cents = S.prepare_centroids(corpus.where(F.col("vec_id") < 16))
    idx = str(tmp_path / "pq-index")
    S.build_pq_index(corpus, cents, books, idx)

    full = S.pq_search(corpus, queries, books, k=5, rerank_to=50)
    probed_all = S.search_pq_index(
        spark, idx, queries, cents, books, corpus, k=5, nprobe=16, rerank_to=50
    )
    assert sorted(map(tuple, probed_all.collect())) == sorted(
        map(tuple, full.collect())
    )

    pruned = S.search_pq_index(
        spark, idx, queries, cents, books, corpus, k=5, nprobe=1, rerank_to=50
    )
    rows = pruned.collect()
    assert len(rows) == 8 * 5
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # 8 queries land in ≤8 of the 16 cells: something was actually pruned
    probed = {
        r["cell"]
        for r in S.ivf_query_cells(queries, cents, 1).select("cell").distinct().collect()
    }
    assert len(probed) < 16


def test_pq_validation_errors(spark):
    emb = load_table(spark, SF001, "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        S.prepare_pq_codebooks(emb, m=5)
    with pytest.raises(ValueError, match="need ids"):
        S.prepare_pq_codebooks(emb, base_id=490)  # only 10 ids exist past 490
    with pytest.raises(ValueError, match="sample of"):
        S.pq_train_codebooks(emb.where(F.col("vec_id") < 4), n_codes=256)


def test_pq_encode_passthrough_keeps_column_type(spark):
    """The passthrough column is declared under its REAL type in the
    mapInPandas schema (ADVICE r10): a string column must survive the
    encode round-trip, not be mis-declared as long."""
    emb = load_table(spark, SF001, "embeddings").withColumn(
        "tag", F.concat(F.lit("v"), F.col("vec_id").cast("string"))
    )
    books = S.prepare_pq_codebooks(emb)
    enc = S.pq_encode(emb.where(F.col("vec_id") < 10), books, passthrough="tag")
    assert enc.schema["tag"].dataType.simpleString() == "string"
    rows = enc.orderBy("vec_id").collect()
    assert [r["tag"] for r in rows] == [f"v{i}" for i in range(10)]
    # the int passthrough the index writer uses still works
    enc2 = S.pq_encode(
        emb.where(F.col("vec_id") < 4).withColumn(
            "cell", (F.col("vec_id") % 2).cast("int")
        ),
        books,
        passthrough="cell",
    )
    assert enc2.schema["cell"].dataType.simpleString() == "int"
    assert {(r["vec_id"], r["cell"]) for r in enc2.collect()} == {
        (0, 0), (1, 1), (2, 0), (3, 1)
    }


def test_append_pq_index_equals_fresh_build(spark, tmp_path):
    """The FAISS add() analogue: build on 2/3 of the corpus, append the
    remaining third with the SAME frozen centroids + books — every
    search result must equal a fresh full build's exactly (assignment
    and encoding are deterministic per (centroids, books))."""
    # exactness (append == fresh rebuild) holds at any corpus size —
    # sized for suite wall-clock, not coverage (r17)
    corpus = _clustered_corpus(spark, n=800)
    queries = corpus.where(F.col("vec_id") < 8)
    books = S.pq_train_codebooks(corpus, m=8, n_codes=16, iterations=2)
    cents = S.prepare_centroids(corpus.where(F.col("vec_id") < 16))

    full_idx = str(tmp_path / "full")
    S.build_pq_index(corpus, cents, books, full_idx)
    inc_idx = str(tmp_path / "inc")
    S.build_pq_index(corpus.where(F.col("vec_id") % 3 != 0), cents, books, inc_idx)
    S.append_pq_index(corpus.where(F.col("vec_id") % 3 == 0), cents, books, inc_idx)

    kw = dict(k=5, nprobe=4, rerank_to=50)
    full = S.search_pq_index(spark, full_idx, queries, cents, books, corpus, **kw)
    inc = S.search_pq_index(spark, inc_idx, queries, cents, books, corpus, **kw)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))
    # both index layouts hold the same id set per cell
    import pyspark.sql.functions as _F

    a = spark.read.parquet(full_idx).groupBy("cell").agg(
        _F.count("*").alias("n"), _F.sum("vec_id").alias("s")
    )
    b = spark.read.parquet(inc_idx).groupBy("cell").agg(
        _F.count("*").alias("n"), _F.sum("vec_id").alias("s")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ivf_drift_report_arrow_path_matches_column(spark, tmp_path):
    """ivf_drift_report flips to the Arrow kernel at C>=32: the drift
    numbers must be identical to the column path's on the same stored
    index (force both by slicing the centroid list around the
    threshold is not possible per-report, so compare a C=64 report
    against a numpy recomputation of moved-count over the stored rows)."""
    import numpy as np

    corpus = _clustered_corpus(spark, n=1200)
    cents16 = S.prepare_centroids(corpus.where(F.col("vec_id") < 16))
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(corpus, cents16, idx)
    # reassess against a DIFFERENT, larger centroid set (drift > 0)
    cents64 = S.prepare_centroids(corpus.where(F.col("vec_id") % 18 == 0))
    assert len(cents64) >= S._IVF_ARROW_MIN_CELLS
    rep = S.ivf_drift_report(spark, idx, cents64)

    rows = spark.read.parquet(idx).select("qvec", "vnorm", "cell").collect()
    cids, cmat, cnorm = S._ivf_kernel_arrays(cents64)
    x = np.array([list(r["qvec"]) for r in rows], dtype=np.int64)
    vn = np.array([r["vnorm"] for r in rows], dtype=np.float64)
    cos = S._ivf_cos_rows(x, cmat, cnorm, vn)
    moved = int((cids[cos.argmax(1)] != np.array([r["cell"] for r in rows])).sum())
    assert rep["n_vectors"] == len(rows) and rep["moved"] == moved
    assert 0 < rep["drift"] < 1


def test_append_pq_index_adversarial_boundaries(spark, tmp_path):
    """append_pq_index across adversarial append boundaries (VERDICT r11
    next #7, the ade6259 treatment for the PQ index): empty delta,
    all-one-cell delta, a delta COLLIDING with already-indexed ids, and
    a build-from-empty-base — each appended index must equal the fresh
    full build over the same effective corpus, cell-by-cell and
    search-by-search (assignment + encoding are deterministic per frozen
    (centroids, books), so append == rebuild is an exact invariant)."""
    corpus = _clustered_corpus(spark, n=400)
    queries = corpus.where(F.col("vec_id") < 6)
    books = S.pq_train_codebooks(corpus, m=8, n_codes=16, iterations=2)
    cents = S.prepare_centroids(corpus.where(F.col("vec_id") < 8))
    kw = dict(k=3, nprobe=3, rerank_to=30)

    def cells_of(path):
        return sorted(
            map(
                tuple,
                spark.read.parquet(path)
                .groupBy("cell")
                .agg(F.count("*").alias("n"), F.sum("vec_id").alias("s"))
                .collect(),
            )
        )

    def search_of(path, base):
        return sorted(
            map(
                tuple,
                S.search_pq_index(spark, path, queries, cents, books, base, **kw).collect(),
            )
        )

    full_idx = str(tmp_path / "full")
    S.build_pq_index(corpus, cents, books, full_idx)
    want_cells, want_search = cells_of(full_idx), search_of(full_idx, corpus)

    # 1. EMPTY delta: a no-op append must not disturb the index
    empty_idx = str(tmp_path / "empty-delta")
    S.build_pq_index(corpus, cents, books, empty_idx)
    S.append_pq_index(corpus.where(F.lit(False)), cents, books, empty_idx)
    assert cells_of(empty_idx) == want_cells
    assert search_of(empty_idx, corpus) == want_search

    # 2. ALL-ONE-CELL delta: every delta vector is a tight copy of one
    #    centroid's blob, so the whole delta lands in one partition
    one_cell = corpus.where(F.col("vec_id") % 16 == 3)  # same blob => same cell
    rest = corpus.join(one_cell.select("vec_id"), "vec_id", "left_anti")
    oc_idx = str(tmp_path / "one-cell")
    S.build_pq_index(rest, cents, books, oc_idx)
    before = dict((c, (n, s)) for c, n, s in cells_of(oc_idx))
    S.append_pq_index(one_cell, cents, books, oc_idx)
    after = dict((c, (n, s)) for c, n, s in cells_of(oc_idx))
    assert cells_of(oc_idx) == want_cells
    assert search_of(oc_idx, corpus) == want_search
    assert sum(1 for c in after if after[c] != before.get(c)) == len(
        {r["cell"] for r in S.ivf_assign(one_cell, cents).select("cell").distinct().collect()}
    )  # only the delta's own cells changed

    # 3. COLLIDING ids: appending rows already in the index is a blind
    #    add (FAISS semantics) — the result equals a fresh build over
    #    the corpus WITH those duplicates present
    dup = corpus.where(F.col("vec_id") % 5 == 0)
    col_idx = str(tmp_path / "collide")
    S.build_pq_index(corpus, cents, books, col_idx)
    S.append_pq_index(dup, cents, books, col_idx)
    dup_corpus = corpus.unionByName(dup)
    ref_idx = str(tmp_path / "collide-ref")
    S.build_pq_index(dup_corpus, cents, books, ref_idx)
    assert cells_of(col_idx) == cells_of(ref_idx)
    assert search_of(col_idx, dup_corpus) == search_of(ref_idx, dup_corpus)

    # 4. EMPTY base: build on nothing, append everything
    eb_idx = str(tmp_path / "empty-base")
    S.build_pq_index(corpus.where(F.lit(False)), cents, books, eb_idx)
    S.append_pq_index(corpus, cents, books, eb_idx)
    assert cells_of(eb_idx) == want_cells
    assert search_of(eb_idx, corpus) == want_search
