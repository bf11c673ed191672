"""Independent-recomputation parity for the extension operators that
don't (yet) occupy a driver oracle slot (VERDICT r5 #1): the same
hash-match bar as the 50-entry window, enforced locally. Each test runs
the Spark operator over the real sf0.01 tables and recomputes the full
result in a second engine — DuckDB SQL where expressible, pure Python
where the semantics are sequential (packing) — then compares
canonicalized row sets exactly."""

import hashlib
import math
import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _canon(pdf: pd.DataFrame):
    pdf = pdf[sorted(pdf.columns)]

    def norm(v):
        try:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return "NULL"
        except (TypeError, ValueError):
            pass
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    return sorted(
        tuple(norm(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )


def test_repetition_features_match_duckdb(spark):
    """Gopher repetition signals recomputed in SQL: n-gram slot counts,
    the lexicographic-max top gram, and both permille shares."""
    from zombi_spark.operators import text_analysis as TA
    from zombi_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    got = TA.repetition_features(docs, n=2).toPandas()

    want = duckdb.sql(
        f"""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS t
          FROM read_parquet('{SF_DIR}/documents.parquet')
        ), g AS (
          SELECT doc_id, unnest(CASE WHEN len(t) >= 2
                   THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                   ELSE [] END) AS gram
          FROM d
        ), c AS (
          SELECT doc_id, gram, count(*) AS ct FROM g GROUP BY 1, 2
        ), ranked AS (
          SELECT doc_id, gram, ct,
                 row_number() OVER (PARTITION BY doc_id ORDER BY ct DESC, gram DESC) AS rn,
                 sum(ct) OVER (PARTITION BY doc_id) AS n_grams,
                 sum(CASE WHEN ct > 1 THEN ct ELSE 0 END)
                   OVER (PARTITION BY doc_id) AS dup
          FROM c
        ), p AS (
          SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, gram AS top_ngram,
                 CAST(floor(1000 * ct / n_grams) AS BIGINT) AS top_ngram_pm,
                 CAST(floor(1000 * dup / n_grams) AS BIGINT) AS dup_ngram_pm
          FROM ranked WHERE rn = 1
        )
        SELECT d.doc_id,
               coalesce(p.n_grams, 0) AS n_grams,
               p.top_ngram,
               coalesce(p.top_ngram_pm, 0) AS top_ngram_pm,
               coalesce(p.dup_ngram_pm, 0) AS dup_ngram_pm
        FROM d LEFT JOIN p USING (doc_id)
        """
    ).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got) == _canon(want)


def test_pack_sequences_match_independent_python(spark):
    """Sequence packing recomputed sequentially in pure Python: the same
    md5 bin assignment, id-ordered next-fit, pack ids and positions —
    exact for every document (the applyInPandas result is deterministic
    and partition-independent, which is what this proves)."""
    from zombi_spark.operators.sharding import pack_sequences
    from zombi_spark.sources.tables import load_table

    budget, n_bins, seed = 120, 16, 13
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    )
    got = {
        int(r["doc_id"]): (int(r["pack_bin"]), int(r["pack_id"]), int(r["pack_pos"]))
        for r in pack_sequences(
            docs, budget_tokens=budget, n_bins=n_bins, seed=seed
        ).collect()
    }

    rows = sorted(
        (int(r["doc_id"]), int(r["n_tokens"])) for r in docs.collect()
    )
    bins: dict[int, list[tuple[int, int]]] = {}
    for doc_id, n_tokens in rows:
        h = int(hashlib.md5(f"{doc_id}:pack:{seed}".encode()).hexdigest()[:15], 16)
        bins.setdefault(h % n_bins, []).append((doc_id, n_tokens))
    want = {}
    for bin_id, members in bins.items():
        pack_no, acc, pos = 0, 0, 0
        for doc_id, t in sorted(members):
            if acc > 0 and acc + t > budget:
                pack_no, acc, pos = pack_no + 1, 0, 0
            acc += t
            want[doc_id] = (bin_id, bin_id * 1_000_000_000 + pack_no, pos)
            pos += 1
    assert got == want


def test_rollup_state_matches_duckdb_over_data_files(spark, tmp_path):
    """The materialized rollup state recomputed by DuckDB straight off
    the table's parquet data files (hive partition columns included) —
    a cross-engine check that the incremental fold equals a from-scratch
    aggregation by an engine that shares no code with the fold."""
    from zombi_spark.ingest.batch import RAW_EVENT_SCHEMA, prepare_events
    from zombi_spark.table.event_table import EventTable
    from zombi_spark.table.rollup import MaterializedRollup

    def batch(start, n):
        rows = [
            ("t", i % 3, f"p{start + i}".encode(),
             1704067200000 + (start + i) * 600_000, None, start + i)
            for i in range(n)
        ]
        return prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA))

    t = EventTable(spark, str(tmp_path), "events")
    roll = MaterializedRollup(t, str(tmp_path / "rollup"))
    t.append(batch(0, 40))
    roll.refresh()
    t.append(batch(40, 25))
    roll.refresh()  # state now = incremental fold of two deltas

    got = roll.read().toPandas()
    files = [os.path.abspath(e["file_path"]) for e in t.files()]
    assert files
    want = duckdb.sql(
        f"""
        SELECT topic, CAST(partition AS INTEGER) AS partition,
               CAST(event_date AS VARCHAR) AS event_date,
               CAST(event_hour AS INTEGER) AS event_hour,
               count(*) AS n_events,
               CAST(sum(octet_length(payload)) AS BIGINT) AS payload_bytes,
               min(timestamp_ms) AS min_ts, max(timestamp_ms) AS max_ts,
               max(sequence) AS max_seq
        FROM read_parquet({files!r}, hive_partitioning = true)
        GROUP BY 1, 2, 3, 4
        """
    ).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got) == _canon(want)


def test_semantic_contamination_matches_numpy(spark):
    """Embedding-space decontamination recomputed with numpy: every
    (corpus, bench) cosine above threshold, quantized exactly like the
    similarity family (round→int64 components, floor(cos·1e6))."""
    import numpy as np

    from zombi_spark.operators import decontaminate as DC
    from zombi_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    bench = emb.where("vec_id >= 490").select(
        F.col("vec_id").alias("bench_id"), "embedding"
    )
    corpus = emb.where("vec_id < 490")
    thr = 300_000
    got = {
        (int(r["vec_id"]), int(r["bench_id"])): int(r["cos_e6"])
        for r in DC.semantic_contamination_scores(
            corpus, bench, threshold_e6=thr
        ).collect()
    }

    rows = emb.collect()
    vecs = {int(r["vec_id"]): np.round(np.array(r["embedding"], dtype=np.float64) * 1e6)
            for r in rows}
    want = {}
    for cid in (i for i in vecs if i < 490):
        for bid in (i for i in vecs if i >= 490):
            a, b = vecs[cid], vecs[bid]
            cos = float(a @ b) / (math.sqrt(float(a @ a)) * math.sqrt(float(b @ b)))
            q = math.floor(cos * 1e6)
            if q >= thr:
                want[(cid, bid)] = q
    assert got == want
