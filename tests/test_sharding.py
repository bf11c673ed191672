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


def test_pack_sequences_respects_budget_and_determinism(spark):
    """Sequence packing: no pack exceeds the token budget (except a
    single over-budget doc, which gets its own pack, never dropped or
    split), packs are contiguous by position, and the assignment is
    byte-stable across reruns and row orderings."""
    import pyspark.sql.functions as F

    from zombi_spark.operators.sharding import pack_sequences

    rows = [(i, 100 + (i * 37) % 400) for i in range(500)] + [(9999, 5000)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(docs, budget_tokens=1024, n_bins=8)
    pdf = packed.toPandas().sort_values(["pack_id", "pack_pos"]).reset_index(drop=True)
    assert len(pdf) == 501  # every doc packed exactly once

    per_pack = pdf.groupby("pack_id").agg(
        total=("n_tokens", "sum"), n=("n_tokens", "size"), maxtok=("n_tokens", "max")
    )
    # budget respected unless the pack is a single over-budget doc
    viol = per_pack[(per_pack.total > 1024) & (per_pack.n > 1)]
    assert viol.empty, viol
    over = pdf[pdf.doc_id == 9999]
    assert len(over) == 1
    assert int(per_pack.loc[int(over.pack_id.iloc[0])].n) == 1  # own pack

    # positions are 0..n-1 within each pack
    for _pid, grp in pdf.groupby("pack_id"):
        assert sorted(grp.pack_pos) == list(range(len(grp)))

    # packing efficiency: most packs land reasonably full
    multi = per_pack[per_pack.n > 1]
    assert (multi.total >= 512).mean() > 0.9

    # determinism under re-run AND input reordering
    again = (
        pack_sequences(docs.orderBy(F.rand(42)), budget_tokens=1024, n_bins=8)
        .toPandas()
        .sort_values(["pack_id", "pack_pos"])
        .reset_index(drop=True)
    )
    assert (pdf[["doc_id", "pack_id", "pack_pos"]].values == again[
        ["doc_id", "pack_id", "pack_pos"]
    ].values).all()


def test_chunk_documents_windows_with_overlap(spark):
    """Long docs split into max_tokens windows with stride overlap; the
    short side passes through whole; boundaries are text-deterministic
    and the plan is narrow (no Exchange, no Python)."""
    import contextlib
    import io

    from zombi_spark.operators.sharding import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "short doc"), (3, "")],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.chunk_id): r for r in chunk_documents(docs, 4, overlap_tokens=1).collect()}
    assert out[(1, 0)].text == "w0 w1 w2 w3"
    assert out[(1, 1)].text == "w3 w4 w5 w6"  # 1-token overlap
    assert out[(1, 2)].text == "w6 w7 w8 w9"
    assert len([k for k in out if k[0] == 1]) == 3
    # every source token survives in order (coverage, minus overlaps)
    rebuilt = []
    for cid in range(3):
        toks = out[(1, cid)].text.split(" ")
        rebuilt.extend(toks if cid == 0 else toks[1:])
    assert rebuilt == [f"w{i}" for i in range(10)]
    assert out[(2, 0)].text == "short doc" and out[(2, 0)].chunk_tokens == 2
    assert out[(3, 0)].chunk_tokens == 0
    # no-overlap variant: disjoint windows, exact tiling
    flat = chunk_documents(docs.where("doc_id = 1"), 5)
    texts = [r.text for r in flat.orderBy("chunk_id").collect()]
    assert texts == ["w0 w1 w2 w3 w4", "w5 w6 w7 w8 w9"]
    # validation
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError):
        chunk_documents(docs, 4, overlap_tokens=4)
    # narrow plan over a real parquet scan (a createDataFrame input
    # plans through a Python RDD scan, which would false-positive)
    from zombi_spark.sources.tables import load_table

    corpus = load_table(spark, "/root/testdata/sf0.01", "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chunk_documents(corpus, 64, overlap_tokens=8).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan and "Python" not in plan


def test_pseudorandom_shard_order_is_shuffled_and_byte_stable(spark, tmp_path):
    """order='pseudorandom': the within-shard order is a deterministic
    global shuffle — different from id order, identical row set, and a
    re-export is byte-identical (same determinism contract as id order)."""
    import hashlib
    import os

    from zombi_spark.operators.sharding import write_training_shards
    from zombi_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(docs, p1, n_shards=4, order="pseudorandom")
    write_training_shards(docs, p2, n_shards=4, order="pseudorandom")

    def digest(root):
        # filenames carry the write job's uuid — compare the SET of file
        # content hashes per shard dir, which is what byte-stable means
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            shard = os.path.basename(dirpath)
            for f in files:
                if f.endswith(".parquet"):
                    out.setdefault(shard, set()).add(
                        hashlib.sha256(
                            open(os.path.join(dirpath, f), "rb").read()
                        ).hexdigest()
                    )
        return out

    assert digest(p1) == digest(p2)  # byte-stable re-export
    shard0 = spark.read.parquet(os.path.join(p1, "shard=0"))
    ids = [r.doc_id for r in shard0.select("doc_id").collect()]
    assert ids != sorted(ids)  # genuinely shuffled within the shard
    # same row set as the id-ordered export
    p3 = str(tmp_path / "s3")
    write_training_shards(docs, p3, n_shards=4, order="id")
    a = sorted(r.doc_id for r in spark.read.parquet(p1).collect())
    b = sorted(r.doc_id for r in spark.read.parquet(p3).collect())
    assert a == b

    import pytest

    with pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "bad"), 4, order="random")


def test_chunk_reconstruction_is_lossless(spark):
    """Coverage invariant across parameterizations: dropping each
    non-first chunk's leading `overlap` tokens and concatenating in
    chunk order reconstructs every document exactly — no token is lost
    or duplicated by the windowing."""
    from zombi_spark.operators.sharding import chunk_documents
    from zombi_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").limit(200)
    originals = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for max_tokens, overlap in ((40, 8), (25, 0), (17, 16)):
        chunks = chunk_documents(docs, max_tokens=max_tokens, overlap_tokens=overlap)
        rows = sorted(
            ((r.doc_id, r.chunk_id, r.text) for r in chunks.collect())
        )
        rebuilt: dict = {}
        for doc_id, chunk_id, text in rows:
            toks = text.split(" ")
            if chunk_id > 0:
                toks = toks[overlap:]
            rebuilt.setdefault(doc_id, []).extend(toks)
        assert set(rebuilt) == set(originals), (max_tokens, overlap)
        for doc_id, toks in rebuilt.items():
            assert " ".join(toks) == originals[doc_id], (doc_id, max_tokens, overlap)
