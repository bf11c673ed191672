"""CCNet-style char-trigram LM quality scoring (operators/lm_quality.py):
reference-likeness separates natural text from gibberish, the model
broadcasts, and the filter keeps exactly the docs above the floor."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from zombi_spark.operators import lm_quality as LM

REFERENCE = [
    "the quick brown fox jumps over the lazy dog and the cat sat on the mat",
    "it was the best of times it was the worst of times in the city of light",
    "a journey of a thousand miles begins with a single step said the teacher",
    "the rain in spain stays mainly in the plain while the wind blows north",
    "to be or not to be that is the question whether it is nobler in the mind",
]


@pytest.fixture(scope="module")
def model(spark):
    ref = spark.createDataFrame([(i, t) for i, t in enumerate(REFERENCE)], "doc_id long, text string")
    return LM.train_char_trigram_model(ref)


def test_char_ngrams_edges(spark):
    df = spark.createDataFrame([(0, "abcd"), (1, "ab"), (2, "")], "i long, t string")
    rows = LM.exploded_char_ngrams(df, F.col("t"), 3, "i").collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r.i, []).append(r.gram)
    assert got == {0: ["abc", "bcd"]}  # too-short docs yield no rows


def test_model_shape(model):
    assert model["vocab_size"] >= 20  # letters + space
    tri = {(r.ctx, r.nxt): r.n_tri for r in model["tri"].collect()}
    assert tri[("th", "e")] >= 10  # 'the' dominates the reference
    assert all(len(ctx) == 2 and len(nxt) == 1 for ctx, nxt in tri)


def test_english_outscores_gibberish(spark, model):
    docs = spark.createDataFrame(
        [
            (0, "the mind of the fox in the rain was the best in the plain"),
            (1, "xq zvkj wpf qqgh zzxv jkqp vvwx qzzj xkvp wwqz jjxx qvkz"),
            (2, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
        ],
        "doc_id long, text string",
    )
    s = {r.doc_id: r.lm_logprob_e6 for r in LM.score_documents(docs, model).collect()}
    assert s[0] > s[1], "natural text must outscore consonant soup"
    assert s[0] > s[2], "natural text must outscore repeated junk"
    # the filter keeps exactly the above-floor docs
    floor = (s[0] + s[1]) // 2
    kept = {r.doc_id for r in LM.perplexity_filter(docs, model, floor).collect()}
    assert kept == {0}


def test_score_is_deterministic_and_broadcast(spark, model):
    docs = spark.createDataFrame(
        [(i, REFERENCE[i % len(REFERENCE)]) for i in range(20)], "doc_id long, text string"
    )
    a = sorted((r.doc_id, r.lm_logprob_e6) for r in LM.score_documents(docs, model).collect())
    b = sorted(
        (r.doc_id, r.lm_logprob_e6)
        for r in LM.score_documents(docs.repartition(7), model).collect()
    )
    assert a == b
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        LM.score_documents(docs, model).explain("formatted")
    assert "Broadcast" in buf.getvalue()  # the model side never shuffles the corpus


def test_unscorable_docs(spark, model):
    docs = spark.createDataFrame([(0, "ab"), (1, "the fox")], "doc_id long, text string")
    rows = {r.doc_id: r for r in LM.score_documents(docs, model).collect()}
    assert rows[0].lm_logprob_e6 is None  # too short for a trigram
    assert rows[1].lm_trigrams == len("the fox") - 2
    kept = {r.doc_id for r in LM.perplexity_filter(docs, model, -100_000_000).collect()}
    assert kept == {1}  # unscorable dropped even with a bottomless floor


def test_scores_documents_table(spark):
    """End-to-end on the synthetic corpus: train on one slice, score the
    rest — every scorable doc gets a finite negative score."""
    from zombi_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    model = LM.train_char_trigram_model(docs.where("source = 'src0'"))
    scored = LM.score_documents(docs.where("source <> 'src0'"), model)
    agg = scored.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("lm_logprob_e6").isNull(), 1).otherwise(0)).alias("nulls"),
        F.max("lm_logprob_e6").alias("best"),
    ).first()
    assert agg.n > 0 and agg.nulls == 0
    assert agg.best < 0  # log-probs are negative by construction
