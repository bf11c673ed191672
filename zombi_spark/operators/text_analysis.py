"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting — the per-document feature pass of a training-data
pipeline.

All pure Column expressions (JVM-side, codegen; no Python in the hot
path), and all integer/string-valued so the DuckDB oracle matches exactly.
One pass over the corpus computes every feature — these compose into a
single projection, not N scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zombi_spark.functions.hashing import md5_long

# Small marker sets for the n-gram/stopword language heuristic. With the
# synthetic corpus these are demonstration markers; swapping in real
# per-language stopword lists changes no code.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "data": ("data", "table", "column", "row", "value"),
    "query": ("query", "join", "filter", "scan", "sort"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: count of maximal runs matching word pieces
    (letters / digits / other), the standard pre-tokenizer regex shape."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)).cast(
        "long"
    )


def marker_score(text: Column, markers: tuple[str, ...]) -> Column:
    """Number of tokens that are in the marker set (multiplicity counted)."""
    toks = _tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("long")


def lang_id(text: Column) -> Column:
    """Heuristic language/domain ID: argmax marker score with declaration
    order as the tie rule (en > data > query); 'und' when all scores are 0.
    Expressed as an explicit CASE chain so the oracle SQL mirrors it
    verbatim."""
    s = {label: marker_score(text, m) for label, m in LANG_MARKERS.items()}
    return (
        F.when((s["en"] > 0) & (s["en"] >= s["data"]) & (s["en"] >= s["query"]), "en")
        .when((s["data"] > 0) & (s["data"] >= s["query"]), "data")
        .when(s["query"] > 0, "query")
        .otherwise("und")
    )


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass quality feature projection:
      n_chars, n_tokens (whitespace), piece_tokens (BPE-ish pre-tokenizer
      count), n_distinct_tokens, avg token length (per-mille), stopword
      count, distinct-token ratio (per-mille), quality_class.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_chars = F.length(text).cast("long")
    # avg token len ×1000, exact integer math: (len - (n-1) spaces) / n
    avg_tok_len_pm = F.floor(F.lit(1000) * (n_chars - (n_tokens - 1)) / n_tokens).cast("long")
    stop_ct = marker_score(text, STOPWORDS)
    distinct_ratio_pm = F.floor(F.lit(1000) * n_distinct / n_tokens).cast("long")
    quality_class = (
        # NULL text first: every later condition is NULL (treated as
        # false) for a null doc, which would fall through to 'ok' —
        # the one class an absent document must never earn
        F.when(text.isNull(), "too_short")
        .when(n_tokens < 10, "too_short")
        .when(distinct_ratio_pm < 300, "repetitive")
        .when(stop_ct == 0, "no_function_words")
        .otherwise("ok")
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        bpe_ish_token_count(text).alias("piece_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        avg_tok_len_pm.alias("avg_token_len_pm"),
        stop_ct.alias("stopword_count"),
        distinct_ratio_pm.alias("distinct_ratio_pm"),
        quality_class.alias("quality_class"),
    )


def repetition_features(
    docs: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition/boilerplate signals (the Gopher-rules family, published
    in the Gopher/MassiveText data paper): per document,

      - ``top_ngram_pm``: share (permille) of n-gram slots taken by the
        single most frequent n-gram — crawler boilerplate and keyword
        stuffing spike this;
      - ``dup_ngram_pm``: share of n-gram slots whose gram occurs more
        than once — long-range self-repetition;
      - ``n_grams``: total n-gram slots (0 for docs shorter than n).

    Shape: explode → two-level aggregate — one shuffle on (doc, gram),
    one on doc. NOT per-row HOF counting, which is O(len²) per document
    and melts on 100k-token docs; this stays linear and spillable at any
    document length. Ties on the top gram break lexicographically (max
    over (count, gram) structs) so results are engine-portable.
    """
    from zombi_spark.operators.dedup import exploded_shingles

    # exploded_shingles, not explode(with_shingles(...)): row-identical,
    # but the gram cut runs in codegen instead of an interpreted
    # higher-order lambda — 20× on the sf0.1 explode (guide §4.1), which
    # was the dominant cost of the pipeline quality stage
    counts = (
        exploded_shingles(docs.select(id_col, text_col), n=n, text_col=text_col, id_col=id_col)
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("ct"))
    )
    per_doc = counts.groupBy(id_col).agg(
        F.sum("ct").alias("n_grams"),
        F.max(F.struct(F.col("ct"), F.col("gram"))).alias("_top"),
        F.sum(F.when(F.col("ct") > 1, F.col("ct")).otherwise(0)).alias("_dup"),
    )
    out = per_doc.select(
        id_col,
        "n_grams",
        F.col("_top.gram").alias("top_ngram"),
        F.floor(F.lit(1000) * F.col("_top.ct") / F.col("n_grams")).cast("long").alias(
            "top_ngram_pm"
        ),
        F.floor(F.lit(1000) * F.col("_dup") / F.col("n_grams")).cast("long").alias(
            "dup_ngram_pm"
        ),
    )
    # docs too short to form a single n-gram: keep them with zeros (a
    # left join back to the corpus id set, not a silent drop)
    return (
        docs.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            "top_ngram",
            F.coalesce("top_ngram_pm", F.lit(0)).alias("top_ngram_pm"),
            F.coalesce("dup_ngram_pm", F.lit(0)).alias("dup_ngram_pm"),
        )
    )


def repetition_filter(
    docs: DataFrame,
    n: int = 2,
    max_top_ngram_pm: int = 180,
    max_dup_ngram_pm: int = 600,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus minus documents whose repetition signals exceed the
    thresholds (defaults in the neighborhood of the published Gopher
    cuts; tune per corpus). Anti-join on the flagged id set."""
    feats = repetition_features(docs, n=n, text_col=text_col, id_col=id_col)
    bad = feats.where(
        (F.col("top_ngram_pm") > max_top_ngram_pm)
        | (F.col("dup_ngram_pm") > max_dup_ngram_pm)
    ).select(id_col)
    return docs.join(bad, id_col, "left_anti")


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive content fingerprint: XOR of distinct-token hashes
    combined with the token count — a rolling-hash-class signature that is
    exact-integer and engine-portable."""
    text = F.col(text_col)
    toks = F.array_distinct(_tokens(text))
    xor_hash = F.aggregate(
        F.transform(toks, md5_long),
        F.lit(0).cast("long"),
        lambda acc, h: acc.bitwiseXOR(h),
    )
    return docs.select(
        F.col(id_col),
        xor_hash.alias("token_xor_hash"),
        token_count(text).alias("n_tokens"),
    )
