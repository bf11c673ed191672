"""Batch ingest: raw events → canonical zombi event rows.

Implements the write-path semantics of the reference
(api/handlers.rs:467-707, storage/rocksdb.rs:637-806) as declarative
DataFrame transforms:

  1. table-name validation      — handlers.rs:447-460 regex
  2. timestamp default          — handlers.rs:709-714 server time
  3. idempotency-key dedup      — rocksdb.rs:645-654 point lookup ⇒
                                  here a semi-join against the existing
                                  table + first-wins within the batch
                                  (INV-4, SPEC.md:752)
  4. per-(topic,partition) monotonic sequence assignment
                                — sequence.rs:60-66 atomic counters ⇒
                                  row_number() + broadcast of per-partition
                                  high watermarks (INV-1, SPEC.md:746)
  5. partition-column derivation — parquet.rs:40-49

Scale notes: steps 3 and 4 SHARE one (topic, partition) exchange — the
dedup window sorts by (idempotency_key, ingest_order) so first-wins is a
lag inequality, and the sequence window only re-sorts the same
partitioning by ingest_order (r17; guide §2.4: two operations keyed the
same way pay one shuffle). The watermark frame (A2: max sequence per partition) is
tiny (one row per producer partition) and is broadcast, never shuffled.
Dedup against history (step 3) is a left_anti join on
(topic, partition, idempotency_key); the streaming path passes
``EventTable.idempotency_history`` — only those 3 columns are read
(column pruning) and only files inside the retention window are scanned
(snapshot-stats file pruning) — never the whole table.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zombi_spark.functions.events import derive_partition_columns, server_time_ms as _server_time_ms

# ^[a-zA-Z][a-zA-Z0-9_-]{0,127}$ — handlers.rs:447-460, SPEC.md:454-460
# \Z, not $: "$" also matches just before a trailing newline, so
# "events\n" would validate and the newline would flow into paths and
# catalog JSON (found by the L6-style name fuzz, fuzz_topic_name.rs)
_TABLE_NAME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9_-]{0,127}\Z")

# BulkWriteEvent (contracts/storage.rs:253-259): pre-sequence-assignment form.
RAW_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("timestamp_ms", T.LongType(), True),
        T.StructField("idempotency_key", T.StringType(), True),
        # arrival order within the batch — drives first-wins dedup and
        # deterministic sequence assignment (combiner.rs preserves FIFO)
        T.StructField("ingest_order", T.LongType(), False),
    ]
)

# StoredEvent + derived partition cols (contracts/storage.rs:204-211,
# iceberg.rs:126-184) — the 8-field canonical schema.
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("sequence", T.LongType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("timestamp_ms", T.LongType(), False),
        T.StructField("idempotency_key", T.StringType(), True),
        T.StructField("event_date", T.DateType(), False),
        T.StructField("event_hour", T.IntegerType(), False),
    ]
)


def validate_table_name(name: str) -> str:
    """Raise ValueError unless ``name`` matches the reference's regex."""
    if not _TABLE_NAME_RE.match(name or ""):
        raise ValueError(
            f"invalid table name {name!r}: must match ^[a-zA-Z][a-zA-Z0-9_-]{{0,127}}$"
        )
    return name


def dedup_idempotency(
    batch: DataFrame,
    existing: DataFrame | None = None,
    history: DataFrame | None = None,
) -> DataFrame:
    """Drop events whose (topic, partition, idempotency_key) already exists.

    Within the batch, the FIRST occurrence (by ingest_order) wins — the
    reference processes writes FIFO and returns the existing offset for
    replays (rocksdb.rs:645-654, 683-688). NULL keys are never deduped.

    ``history`` is the preferred probe set: a pre-pruned
    (topic, partition, idempotency_key) frame (e.g.
    ``EventTable.idempotency_history`` — retention-window file pruning +
    column pruning). ``existing`` is the legacy full-table form, kept for
    callers that already hold a scan.

    Shuffle shape (r17, guide §2.4): ONE window partitioned by
    (topic, partition) — the exact partitioning :func:`assign_sequences`
    needs next, so the whole prepare pipeline plans a SINGLE exchange
    (the old (t, p, key)-keyed window forced a second full-batch shuffle
    before the sequence window; measured 2 Exchange → 1 on the write
    path). Sorting the partition by (key, ingest_order) groups each
    key's rows into a run; first-of-run — via a null-safe lag
    inequality — IS ``row_number() == 1`` per (t, p, key), and NULL
    keys are never deduped (the isNull arm keeps them all). The history
    anti-join moved BEFORE the window: a key present in history kills
    every batch row carrying it either way (first-wins keeps one, the
    join removes it), and NULL-keyed rows pass through a left_anti on
    the key untouched (NULL never equals a probe row) — so the old
    keyed/keyless split is unnecessary.
    """
    if history is None and existing is not None:
        history = existing.select("topic", "partition", "idempotency_key")
    if history is not None:
        probe = history.where(F.col("idempotency_key").isNotNull()).select(
            "topic", "partition", "idempotency_key"
        )
        batch = batch.join(
            probe, on=["topic", "partition", "idempotency_key"], how="left_anti"
        )
    w = Window.partitionBy("topic", "partition").orderBy(
        F.col("idempotency_key").asc_nulls_first(), F.col("ingest_order")
    )
    prev_key = F.lag("idempotency_key").over(w)
    return (
        batch.withColumn("_prev_key", prev_key)
        .where(
            F.col("idempotency_key").isNull()
            | ~F.col("_prev_key").eqNullSafe(F.col("idempotency_key"))
        )
        .drop("_prev_key")
    )


def assign_sequences(
    batch: DataFrame,
    existing: DataFrame | None = None,
    watermarks: DataFrame | None = None,
) -> DataFrame:
    """Assign per-(topic, partition) monotonic sequences starting at 1.

    Continues from the committed high watermark (A2 — rocksdb.rs:851-853).
    ``watermarks`` is the preferred base: a (topic, partition, _base_seq)
    frame built from the snapshot summary (``EventTable.watermark_map`` —
    zero data files read). ``existing`` is the legacy form that derives
    the same frame with a full-table aggregate. Either way the frame is
    one row per producer partition → broadcast.
    """
    w = Window.partitionBy("topic", "partition").orderBy("ingest_order")
    seq_in_batch = batch.withColumn("_seq_in_batch", F.row_number().over(w))

    if watermarks is None and existing is not None:
        watermarks = existing.groupBy("topic", "partition").agg(
            F.max("sequence").alias("_base_seq")
        )
    if watermarks is not None:
        seq_in_batch = seq_in_batch.join(
            F.broadcast(watermarks), on=["topic", "partition"], how="left"
        )
    else:
        seq_in_batch = seq_in_batch.withColumn("_base_seq", F.lit(None).cast("long"))

    return (
        seq_in_batch.withColumn(
            "sequence", F.coalesce(F.col("_base_seq"), F.lit(0)) + F.col("_seq_in_batch")
        )
        .drop("_seq_in_batch", "_base_seq")
    )


def prepare_events(
    batch: DataFrame,
    existing: DataFrame | None = None,
    server_time_ms: int | None = None,
    history: DataFrame | None = None,
    watermarks: DataFrame | None = None,
) -> DataFrame:
    """Full write-path transform: defaults → dedup → sequences → partitions.

    Returns rows in EVENT_SCHEMA column order. ``server_time_ms`` pins the
    default timestamp for reproducibility (tests); None = current time.
    ``history``/``watermarks`` are the bounded metadata-driven inputs (see
    :func:`dedup_idempotency` / :func:`assign_sequences`); ``existing``
    derives both from a full scan when they're absent.
    """
    now = (
        _server_time_ms()  # the one canonical server-time default (F3)
        if server_time_ms is None
        else F.lit(server_time_ms).cast("long")
    )
    batch = batch.withColumn("timestamp_ms", F.coalesce(F.col("timestamp_ms"), now))
    batch = dedup_idempotency(batch, existing, history=history)
    batch = assign_sequences(batch, existing, watermarks=watermarks)
    event_date, event_hour = derive_partition_columns(F.col("timestamp_ms"))
    return batch.select(
        "sequence",
        "topic",
        "partition",
        "payload",
        "timestamp_ms",
        "idempotency_key",
        event_date,
        event_hour,
    )
