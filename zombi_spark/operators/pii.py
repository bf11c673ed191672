"""PII detection and redaction for training corpora — the scrub step a
large-scale text pipeline runs between dedup and sharding (emails,
phone numbers, IP addresses, SSN-shaped ids, credit-card-shaped
numbers), as pure Column ``regexp`` programs: JVM-side, codegen'd, zero
Python in the hot path. Patterns are the standard public shapes; this
is pattern scrubbing, not NER — a documented precision/recall tradeoff
(a model-based pass would slot in as a mapInPandas stage like the
multimodal codecs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name → (regex, replacement token). Order matters: credit-card and
# ipv4 before phone — a 16-digit run must not be half-eaten as a phone
# number, and phone's optional country-code digit would otherwise bite
# the last octet off an adjacent IP.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "credit_card",
        # grouped card shapes with a CONSISTENT separator (backreference):
        # 4-4-4-4, amex 4-6-5, or 13-16 bare digits. A naive
        # (?:\d[ -]?){13,16} lets ONE match greedily bridge two adjacent
        # distinct items ("123-45-6789 123-456-7890" → "<CARD>7890",
        # merging an SSN and a phone and leaking the phone's tail digits).
        r"\b(?:\d{4}([ -])\d{4}\1\d{4}\1\d{4}|\d{4}([ -])\d{6}\2\d{5}|\d{13,16})\b",
        "<CARD>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "ipv4",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"(?:\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b",
        "<PHONE>",
    ),
]


def pii_counts(text: Column) -> Column:
    """Map of PII kind → occurrence count in ``text`` (detection pass —
    run it to DECIDE; redact() to ACT). One regexp_count per kind."""
    return F.map_from_arrays(
        F.array(*[F.lit(name) for name, _p, _r in PII_PATTERNS]),
        F.array(
            *[F.regexp_count(text, F.lit(pattern)) for _n, pattern, _r in PII_PATTERNS]
        ),
    )


def redact(text: Column) -> Column:
    """``text`` with every PII match replaced by its typed token,
    patterns applied in declaration order."""
    out = text
    for _name, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def scrub_documents(
    docs: DataFrame, text_col: str = "text", max_pii_per_doc: int | None = None
) -> DataFrame:
    """The pipeline stage: adds ``pii_counts`` (map) and ``pii_total``,
    replaces ``text_col`` with its redacted form, and — when
    ``max_pii_per_doc`` is set — DROPS documents whose raw PII density
    is above the cap (heavily contaminated docs are usually scraped
    dumps worth excluding entirely rather than tokenizing a wall of
    redaction markers)."""
    counts = pii_counts(F.col(text_col))
    out = docs.withColumn("pii_counts", counts).withColumn(
        "pii_total",
        F.aggregate(F.map_values(F.col("pii_counts")), F.lit(0), lambda a, b: a + b),
    )
    if max_pii_per_doc is not None:
        out = out.where(F.col("pii_total") <= max_pii_per_doc)
    return out.withColumn(text_col, redact(F.col(text_col)))
