"""The operators COMPOSE: one end-to-end training-data pipeline run —
dedup → benchmark decontamination → PII scrub → quality filtering
(repetition + LM perplexity) → mixture re-weighting → splits → sequence
packing → shard export → dataset card — over the synthetic documents
corpus, with the invariants each stage owes the next checked in line.
Every stage is the real operator the COVERAGE map lists; this test is
the proof they fit together the way a pipeline would actually run."""

import json
import os

import pytest
from pyspark.sql import functions as F

from zombi_spark.operators import dedup as D
from zombi_spark.operators import decontaminate as DC
from zombi_spark.operators import lm_quality as LM
from zombi_spark.operators import mixture as MX
from zombi_spark.operators import pii as P
from zombi_spark.operators import sharding as SH
from zombi_spark.operators import text_analysis as TA
from zombi_spark.operators.dataset_card import dataset_card
from zombi_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_full_training_pipeline(spark, tmp_path):
    # Each stage is materialized ONCE via localCheckpoint as it is built:
    # the assertions consume every stage several times, and on fully lazy
    # lineage each count re-ran the whole upstream pipeline (measured
    # 201 s for this test). localCheckpoint also TRUNCATES the plan —
    # chaining persist() instead leaves every stage's tree nested inside
    # the next one's InMemoryRelation, and CacheManager/Catalyst work on
    # those growing trees blew planning up to minutes per stage (measured:
    # stage-5 count alone took ~300 s under 12 chained persists). This
    # mirrors the checkpointed-pipeline shape a real run uses (the bench
    # pipe writes each stage to parquet); the invariants are unchanged.
    def mat(df):
        return df.localCheckpoint()

    _run_pipeline(spark, tmp_path, mat)


def _run_pipeline(spark, tmp_path, mat):
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. exact dedup: keep the canonical representative per content hash
    keep = D.exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    stage1 = mat(docs.join(keep, "doc_id", "left_semi"))
    n1 = stage1.count()
    assert 0 < n1 <= n0

    # 1b. duplicate-span removal (paragraph-level dedup): documents are
    #     rebuilt from their surviving spans; corpus-wide kept spans ==
    #     distinct spans (the operator's exactness invariant), and docs
    #     reduced to nothing drop out of the pipeline
    spans = mat(D.remove_duplicate_spans(stage1, span_tokens=6))
    distinct_spans = (
        D._doc_spans(stage1, 6, "doc_id", "text").select("span_text").distinct().count()
    )
    assert spans.agg(F.sum("n_kept")).collect()[0][0] == distinct_spans
    stage1b = mat(
        stage1.drop("text", "n_chars")
        .join(spans.where(F.col("n_kept") > 0), "doc_id")
        .select(
            "doc_id",
            F.col("cleaned_text").alias("text"),
            "lang",
            "source",
            F.length("cleaned_text").alias("n_chars"),
        )
    )
    n1b = stage1b.count()
    assert 0 < n1b <= n1
    stage1 = stage1b

    # 2. benchmark decontamination: plant 3 eval items as verbatim
    #    slices of real docs — those docs (and only provably-overlapping
    #    ones) must drop
    planted = stage1.where(F.size(F.split("text", " ")) >= 12).orderBy("doc_id").limit(3).collect()
    bench = spark.createDataFrame(
        [(100 + i, " ".join(r.text.split()[:12])) for i, r in enumerate(planted)],
        "bench_id long, text string",
    )
    stage2 = mat(DC.decontaminate(stage1, bench, n=8, threshold_pm=800))
    n2 = stage2.count()
    assert n2 <= n1 - 3  # at least the 3 planted hosts are gone
    flagged = DC.contaminated_ids(stage1, bench, n=8, threshold_pm=800)
    assert {r.doc_id for r in planted} <= {r.doc_id for r in flagged.collect()}

    # 3. PII scrub: text replaced by its redacted form, nothing dropped
    #    without a density cap
    stage3 = mat(P.scrub_documents(stage2))
    assert stage3.count() == n2
    assert stage3.where("pii_total > 0").where(F.col("text").rlike("@")).count() == 0

    # 4a. repetition (Gopher-family) filter
    stage4a = mat(TA.repetition_filter(stage3))
    n4a = stage4a.count()
    assert 0 < n4a <= n2

    # 4b. LM perplexity filter: train on the surviving corpus, drop the
    #     worst ~decile by log-prob floor
    model = LM.train_char_trigram_model(stage4a)
    scored = LM.score_documents(stage4a, model)
    floor = scored.approxQuantile("lm_logprob_e6", [0.1], 0.0)[0]
    stage4 = mat(LM.perplexity_filter(stage4a, model, int(floor)))
    n4 = stage4.count()
    assert 0 < n4 <= n4a
    assert n4 >= int(0.8 * n4a)  # a decile floor must not gut the corpus

    # 4c. per-source caps BEFORE re-weighting: bound the most dominant
    #     source so mixture weights act on a balanced base
    dominant, dom_n = max(
        ((r["source"], r["n"]) for r in stage4.groupBy("source").agg(F.count("*").alias("n")).collect()),
        key=lambda kv: kv[1],
    )
    cap = max(1, dom_n - 2)
    stage4c = mat(MX.cap_per_source(stage4, cap))
    assert stage4c.where(F.col("source") == dominant).count() == cap
    stage4 = stage4c

    # 5. mixture: src0 over-sampled 2x, everything else 1 pass
    sources = [r.source for r in stage4.select("source").distinct().collect()]
    weights = {s: (2.0 if s == "src0" else 1.0) for s in sources}
    stage5 = mat(MX.mixture_sample(stage4, weights))
    per_src = {r["source"]: r["n"] for r in stage5.groupBy("source").agg(F.count("*").alias("n")).collect()}
    base_src0 = stage4.where("source = 'src0'").count()
    if base_src0:
        assert per_src["src0"] == 2 * base_src0
    # epoch-aware unique id for everything downstream
    stage5 = mat(stage5.withColumn("uid", F.col("doc_id") * 10 + F.col("epoch")))

    # 6. splits are exhaustive, disjoint by construction, and stable
    stage6 = mat(SH.split_assignment(stage5, {"train": 0.9, "val": 0.05, "test": 0.05}, id_col="uid"))
    by_split = {r.split: r.n for r in stage6.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by_split.values()) == stage5.count()
    assert by_split.get("train", 0) > by_split.get("val", 0)

    # 7. sequence packing on the train split: every pack within budget
    train = mat(stage6.where("split = 'train'").join(
        TA.quality_features(stage5, id_col="uid").select("uid", "n_tokens"), "uid"
    ))
    packed = SH.pack_sequences(train, budget_tokens=512, id_col="uid")
    over = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tok"), F.count("*").alias("n"))
        .where((F.col("tok") > 512) & (F.col("n") > 1))
    )
    assert over.count() == 0  # only single-doc over-budget packs allowed

    # 8. shard export in training order (deterministic global shuffle):
    #    every train row lands in exactly one shard file
    out = str(tmp_path / "shards")
    SH.write_training_shards(
        train.select("uid", "text"), out, n_shards=4, id_col="uid",
        order="pseudorandom",
    )
    back = spark.read.parquet(out)
    assert back.count() == train.count()
    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert len(shard_dirs) == 4

    # 9. dataset card over the final corpus reconciles with the data
    card = dataset_card(stage4)
    assert card["totals"]["documents"] == stage4.count()
    assert json.dumps(card)  # serializable end to end
