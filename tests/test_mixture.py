"""Mixture sampling (operators/mixture.py): epoch-weighted,
deterministic, shuffle-free source re-weighting for training exports."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from zombi_spark.operators import mixture as M
from zombi_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_epoch_weights_hit_expected_counts(docs):
    """w=2.5 → every doc twice plus a ~half gated third pass; w=1 → one
    pass exactly; w=0 / unlisted → dropped."""
    n = docs.where("source = 'src0'").count()
    out = M.mixture_sample(docs, {"src0": 2.5, "src1": 1.0, "src2": 0.0})
    by = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by["src1"] == n
    assert "src2" not in by and "src3" not in by
    # 2n certain + gated extra within a generous binomial tolerance
    assert 2 * n <= by["src0"] <= 3 * n
    assert abs(by["src0"] - 2.5 * n) <= 0.35 * n
    # epochs are 0,1 for all docs and 2 only for the gated subset
    epochs = {r["epoch"] for r in out.where("source = 'src0'").select("epoch").distinct().collect()}
    assert epochs == {0, 1, 2}
    extra = out.where("source = 'src0' AND epoch = 2").count()
    assert extra == by["src0"] - 2 * n


def test_deterministic_and_row_order_stable(docs):
    """Same (corpus, weights, seed) → identical doc selection even after
    a repartition; a different seed picks a different fractional subset."""
    w = {"src0": 0.4}
    a = sorted(r.doc_id for r in M.mixture_sample(docs, w).select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in M.mixture_sample(docs.repartition(13), w).select("doc_id").collect()
    )
    assert a == b and 0 < len(a) < docs.where("source='src0'").count()
    c = sorted(r.doc_id for r in M.mixture_sample(docs, w, seed=7).select("doc_id").collect())
    assert c != a


def test_no_shuffle_in_sample_plan(docs):
    """The sample is narrow — literal map + explode + hash gate; any
    Exchange would mean the mixture pass re-shuffles 100 TB for nothing."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        M.mixture_sample(docs, {"src0": 1.5, "src1": 0.5}).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_report_reconciles(docs):
    w = {"src0": 2.0, "src1": 1.0, "src4": 1.0}
    rep = {r["source"]: r for r in M.mixture_report(docs, w, token_col="n_chars").collect()}
    assert set(rep) == set(w)
    sampled = M.mixture_sample(docs, w)
    direct = {r["source"]: r["n"] for r in sampled.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for s in w:
        assert rep[s]["sampled_rows"] == direct[s]
        assert rep[s]["weight"] == w[s]
    assert rep["src0"]["target_share_pm"] == 500
    assert rep["src0"]["sampled_tokens"] > 0
    # input_docs is the CORPUS census, not the sampled-doc count
    for s in w:
        assert rep[s]["input_docs"] == docs.where(F.col("source") == s).count()
    # integer epochs duplicate tokens too: src0 tokens = 2 × its corpus tokens
    base = docs.where("source='src0'").agg(F.sum("n_chars")).first()[0]
    assert rep["src0"]["sampled_tokens"] == 2 * base


def test_report_keeps_zero_sample_sources(docs):
    """A weighted source whose hash gate selects nothing must still
    appear in the report (achieved 0 vs its target), not vanish."""
    rep = {r["source"]: r for r in M.mixture_report(docs, {"src9": 1e-6, "src0": 1.0}).collect()}
    assert set(rep) == {"src0", "src9"}
    assert rep["src9"]["sampled_rows"] == 0
    assert rep["src9"]["input_docs"] == docs.where("source='src9'").count()
    assert rep["src9"]["achieved_share_pm"] == 0
    assert rep["src9"]["target_share_pm"] == 0  # rounds from 1e-6/1.000001


def test_weight_validation(docs):
    with pytest.raises(ValueError):
        M.mixture_sample(docs, {})
    with pytest.raises(ValueError):
        M.mixture_sample(docs, {"src0": -1.0})


def test_cap_per_source_bounds_and_is_deterministic(docs):
    """Per-source caps: a dominant source is bounded at exactly max_docs
    with a pseudo-random (not first-N-by-id) selection, under-cap
    sources pass through complete, and the selected set is stable under
    repartitioning; a different seed picks a different subset."""
    n_src0 = docs.where("source = 'src0'").count()
    cap = n_src0 // 2
    out = M.cap_per_source(docs, cap)
    by = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by["src0"] == cap
    for s, n in by.items():
        assert n <= max(cap, docs.where(F.col("source") == s).count())
    small = min(by, key=lambda s: docs.where(F.col("source") == s).count())
    assert by[small] == docs.where(F.col("source") == small).count() or by[small] == cap
    # pseudo-random, not first-N: the kept src0 ids differ from sorted head
    kept = sorted(r.doc_id for r in out.where("source='src0'").select("doc_id").collect())
    first_n = sorted(
        r.doc_id for r in docs.where("source='src0'").orderBy("doc_id").limit(cap).collect()
    )
    assert kept != first_n
    # stable under repartition; seed changes the subset
    again = sorted(
        r.doc_id
        for r in M.cap_per_source(docs.repartition(17), cap)
        .where("source='src0'").select("doc_id").collect()
    )
    assert again == kept
    other = sorted(
        r.doc_id
        for r in M.cap_per_source(docs, cap, seed=9)
        .where("source='src0'").select("doc_id").collect()
    )
    assert other != kept

    with pytest.raises(ValueError):
        M.cap_per_source(docs, 0)


def test_cap_prefilter_equals_naive_ranking_on_skewed_corpus(spark):
    """The closed-form cutoff + bounded window must select EXACTLY the
    set a naive full-source window would — verified on a corpus where
    one source holds ~95% of the rows (the skew case the prefilter
    exists for)."""
    from pyspark.sql import Window

    from zombi_spark.functions.hashing import md5_long

    big = spark.range(20_000).select(
        F.col("id").alias("doc_id"), F.lit("dump").alias("source")
    )
    small = spark.range(20_000, 21_000).select(
        F.col("id").alias("doc_id"), F.lit("books").alias("source")
    )
    docs = big.unionByName(small)
    cap = 500
    got = sorted(
        (r["source"], r["doc_id"]) for r in M.cap_per_source(docs, cap).collect()
    )
    order = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":cap:0")))
    w = Window.partitionBy("source").orderBy(order.asc(), F.col("doc_id").asc())
    want = sorted(
        (r["source"], r["doc_id"])
        for r in docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .collect()
    )
    assert got == want
    assert sum(1 for s, _ in got if s == "dump") == cap
    assert sum(1 for s, _ in got if s == "books") == cap


def test_cap_per_source_null_source_rows_survive(spark):
    """NULL-source rows are a group, not collateral: isin() three-valued
    logic must not drop them from both branches, whether the NULL group
    is under the cap (pass through complete) or over it (capped like
    any other source)."""
    named = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("web").alias("source")
    )
    nulls = spark.range(1000, 1040).select(
        F.col("id").alias("doc_id"), F.lit(None).cast("string").alias("source")
    )
    docs = named.unionByName(nulls)
    # NULL group (40) under the cap, 'web' (1000) over it
    out = M.cap_per_source(docs, 100)
    by = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by == {"web": 100, None: 40}
    # NULL group itself over the cap: capped, deterministic, no TypeError
    out2 = M.cap_per_source(docs, 25)
    by2 = {r["source"]: r["n"] for r in out2.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by2 == {"web": 25, None: 25}
    kept = sorted(r.doc_id for r in out2.where(F.col("source").isNull()).collect())
    again = sorted(
        r.doc_id
        for r in M.cap_per_source(docs.repartition(13), 25)
        .where(F.col("source").isNull()).collect()
    )
    assert kept == again
    # ONLY the NULL group over the cap (empty `over` list, so the named
    # branch's cut_map is the zero-entry map): named rows pass through
    # complete, NULLs capped
    out3 = M.cap_per_source(docs.where(F.col("doc_id") >= 990), 30)
    by3 = {r["source"]: r["n"] for r in out3.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by3 == {"web": 10, None: 30}
