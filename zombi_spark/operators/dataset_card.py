"""Dataset card: the summary artifact a training run ships with its
data — corpus totals, per-source/per-language composition, token
statistics, quality-class distribution, and split sizes, computed in a
FIXED number of aggregation passes regardless of corpus size and
serialized as one JSON document.

Everything here is a rollup of operators that already exist (quality
features, split assignment); the card is the composition, not new math.
Two passes total: one over the doc-level feature projection (grouping
sets give global + per-source + per-language in a single aggregate),
one for the split histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zombi_spark.operators.text_analysis import quality_features


def dataset_card(
    docs: DataFrame,
    split_weights: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Build the card for a corpus with (id, text, lang?, source?)
    columns. Returns a plain dict (json.dumps-able)."""
    feats = quality_features(docs, text_col=text_col, id_col=id_col)
    dims = [c for c in ("source", "lang") if c in docs.columns]
    enriched = feats.join(docs.select(id_col, *dims), id_col) if dims else feats

    # ONE aggregation over the corpus at the finest grain; the global
    # row and each per-dimension section re-aggregate the tiny result
    group_cols = dims + ["quality_class"]
    rolled = enriched.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("piece_tokens").alias("piece_tokens"),
    )
    # re-aggregate the (small) grouped frame per requested set — the
    # same decomposable-aggregate trick as grouping_analytics: the
    # corpus is scanned once, every rollup reads the tiny frame
    rolled = rolled.persist()
    card: dict = {}
    total = rolled.agg(
        F.sum("n_docs").alias("d"),
        F.sum("n_tokens").alias("t"),
        F.sum("n_chars").alias("c"),
        F.sum("piece_tokens").alias("p"),
    ).first()
    card["totals"] = {
        "documents": int(total["d"] or 0),
        "whitespace_tokens": int(total["t"] or 0),
        "chars": int(total["c"] or 0),
        "piece_tokens": int(total["p"] or 0),
    }
    for col in group_cols:
        rows = (
            rolled.groupBy(col)
            .agg(F.sum("n_docs").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
            .orderBy(col)
            .collect()
        )
        card[f"by_{col}"] = {
            str(r[col]): {"documents": int(r["n_docs"]), "tokens": int(r["n_tokens"])}
            for r in rows
        }
    rolled.unpersist()

    if split_weights:
        from zombi_spark.operators.sharding import split_assignment

        split_rows = (
            split_assignment(docs.select(id_col), split_weights, id_col=id_col)
            .groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        card["splits"] = {r["split"]: int(r["n"]) for r in split_rows}
    return card
