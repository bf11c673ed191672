"""Deterministic splits + training shards — the export mile of the
pipeline: RNG-free assignment, byte-stable re-exports."""

import hashlib
import os

import pyspark.sql.functions as F

from zombi_spark.operators.sharding import (
    shard_id,
    split_assignment,
    write_training_shards,
)
from zombi_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_split_assignment_stable_and_weighted(spark):
    docs = load_table(spark, SF, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in split_assignment(docs, w).collect()}
    # stable across reruns AND row-order changes
    b = {
        r.doc_id: r.split
        for r in split_assignment(docs.orderBy(F.rand(42)), w).collect()
    }
    assert a == b
    n = len(a)
    counts = {s: sum(1 for v in a.values() if v == s) for s in w}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 0.7 * n  # weights roughly respected
    assert counts["val"] + counts["test"] < 0.3 * n
    # exhaustive and exclusive by construction (one split per row)
    assert sum(counts.values()) == n


def test_shards_balanced_and_byte_stable(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    n_shards = 8

    def export(p):
        write_training_shards(docs, p, n_shards)
        out = {}
        for d in sorted(os.listdir(p)):
            if not d.startswith("shard="):
                continue
            files = [f for f in os.listdir(os.path.join(p, d)) if f.endswith(".parquet")]
            assert len(files) == 1  # one file per shard
            out[d] = hashlib.sha256(
                open(os.path.join(p, d, files[0]), "rb").read()
            ).hexdigest()
        return out

    h1 = export(str(tmp_path / "e1"))
    h2 = export(str(tmp_path / "e2"))
    assert len(h1) == n_shards
    assert h1 == {d: h for d, h in h2.items()}  # byte-identical re-export

    # shard assignment is uniform-ish: no shard holds > 2x the mean
    sizes = (
        docs.withColumn("s", shard_id(F.col("doc_id"), n_shards))
        .groupBy("s")
        .count()
        .collect()
    )
    mean = sum(r["count"] for r in sizes) / n_shards
    assert max(r["count"] for r in sizes) < 2 * mean

    # every row lands in exactly one shard
    total = spark.read.parquet(str(tmp_path / "e1")).count()
    assert total == docs.count()
