"""zombi_spark — a PySpark-native analytics engine with the capabilities of
rajeev-ranj/zombi (an Iceberg-native event ingestion gateway), rebuilt
Spark-first rather than ported.

Layers (see SURVEY.md):
  1. ingest/  — event ingestion: sequence assignment, idempotency dedup,
     partition derivation, sorted partitioned writes (zombi's write path).
  2. table/   — table maintenance: snapshot log, watermarks, compaction
     (zombi's flusher + Iceberg commit path).
  3. operators/, plans/ — the query surface zombi delegates to external
     engines (scans, predicates, joins, aggregations, windows) plus the
     LLM-data-pipeline extensions (dedup, similarity, text analysis,
     multimodal).
  4. streaming/ — Structured Streaming ingest (zombi's hot path).

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning and
join strategy; Python touches rows only through Arrow-batched pandas UDFs.
"""

from zombi_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
