"""Read surface: tail reads, range scans, projections (SURVEY.md §2.1/2.2/2.7).

Reference entry points:
  - tail read          GET /tables/{t}?since&limit&fields
                       handlers.rs:934-1033, rocksdb.rs:1017-1062
  - sequence-range     rocksdb.rs:808-849
  - timestamp-range    rocksdb.rs:1064-1127 (half-open [since, until))
  - projection         handlers.rs:737-813, contracts/storage.rs:168-200

Each returns a lazily-planned DataFrame. ``ORDER BY ... LIMIT n`` compiles
to Spark's TakeOrderedAndProject — per-partition top-k then a driver-side
merge of k·partitions rows, never a global sort; that is the plan that
survives a 100× scale-up (reference does the same merge by hand:
per-partition reads → sort → truncate, rocksdb.rs:1054-1059).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# KNOWN_COLUMNS — contracts/storage.rs:168-200
KNOWN_COLUMNS = (
    "sequence",
    "topic",
    "partition",
    "payload",
    "timestamp_ms",
    "idempotency_key",
    "event_date",
    "event_hour",
)
# Default projection {payload, timestamp_ms} — handlers.rs:771-778
DEFAULT_PROJECTION = ("payload", "timestamp_ms")


def parse_projection(fields: str | None) -> list[str]:
    """P1/P9: validate a comma-separated field list against KNOWN_COLUMNS.

    Unknown field ⇒ ValueError (the reference returns HTTP 400,
    handlers.rs:751-758). None/empty ⇒ default projection (P2).
    """
    if not fields:
        return list(DEFAULT_PROJECTION)
    cols = [c.strip() for c in fields.split(",") if c.strip()]
    unknown = [c for c in cols if c not in KNOWN_COLUMNS]
    if unknown:
        raise ValueError(f"unknown field(s) {unknown}; known: {KNOWN_COLUMNS}")
    return cols


def tail_read(
    events: DataFrame,
    since_ms: int | None = None,
    limit: int = 100,
    fields: str | None = None,
) -> DataFrame:
    """S7: merged-across-partitions tail read ordered by timestamp.

    Returns ``limit + 1`` rows so the caller can derive ``has_more``
    (O4, handlers.rs:992-1001); use :func:`has_more` for the flag.
    
    NOTE on direction: this is the SURVEY §7 replay read — ascending from
    ``since_ms`` (oldest-first pages, the oracle-checked contract). The
    HTTP edge's ``GET /tables/{t}`` serves the other S7 surface,
    ``StreamingIngest.tail`` — NEWEST-first (a live tail). Both are
    intentional; pick by use: replay/export reads ascend, dashboards tail
    descend.
    """
    cols = parse_projection(fields)
    df = events
    if since_ms is not None:
        df = df.where(F.col("timestamp_ms") >= F.lit(since_ms))  # P3
    # sequence tiebreak keeps the page content deterministic under equal
    # timestamps (the reference's merge sorts (ts, seq), rocksdb.rs:1054-1059)
    return df.orderBy("timestamp_ms", "sequence").select(*cols).limit(limit + 1)


def has_more(page: list, limit: int) -> tuple[list, bool]:
    """O4: limit+1 paging contract — truncate and flag."""
    return page[:limit], len(page) > limit


def sequence_range_scan(
    events: DataFrame, partition: int, start_offset: int, limit: int | None = None
) -> DataFrame:
    """S8/P5/P6: one producer partition from a sequence offset, in order.

    File skipping comes from parquet min/max stats on ``sequence``
    (the reference uses its RocksDB key prefix iterator, rocksdb.rs:816-825).
    """
    df = (
        events.where((F.col("partition") == partition) & (F.col("sequence") >= start_offset))
        .orderBy("sequence")
    )
    return df.limit(limit) if limit is not None else df


def timestamp_range_scan(
    events: DataFrame, since_ms: int, until_ms: int, partition: int | None = None
) -> DataFrame:
    """S9/P4: half-open [since_ms, until_ms) time-range scan.

    Iceberg/parquet stats replace the reference's ``ts:`` secondary index
    (rocksdb.rs:1064-1127): event_date/event_hour partition pruning narrows
    directories, then row-group stats on timestamp_ms skip within them.
    """
    df = events.where(
        (F.col("timestamp_ms") >= F.lit(since_ms)) & (F.col("timestamp_ms") < F.lit(until_ms))
    )
    if partition is not None:
        df = df.where(F.col("partition") == partition)
    return df.orderBy("timestamp_ms", "sequence")


def negotiate_output_format(accept: str | None) -> str:
    """F9/S12: Accept-header q-value negotiation (handlers.rs:906-932) —
    picks 'arrow' or 'json' by highest q; ties and unknown types fall back
    to json (the reference's default content type)."""
    ARROW = "application/vnd.apache.arrow.stream"
    if not accept:
        return "json"
    # rank by (q, specificity): RFC 7231 — an exact media type outranks
    # application/* outranks */* at equal q, so "arrow, */*" (explicit
    # preference + standard wildcard fallback) negotiates arrow. Among
    # entries EQUAL on both, json wins regardless of header order — the
    # documented ties-fall-back-to-json default.
    best, best_key = "json", (-1.0, -1)
    for part in accept.split(","):
        bits = part.strip().split(";")
        mtype = bits[0].strip().lower()
        q = 1.0
        for p in bits[1:]:
            # HTTP parameter names are case-insensitive (RFC 7231):
            # ';Q=0' must exclude the type exactly like ';q=0'
            p = p.strip().lower()
            if p.startswith("q="):
                try:
                    q = float(p[2:])
                except ValueError:
                    q = 0.0
        if q <= 0:  # q=0 (or unparsable) means "not acceptable"
            continue
        if mtype == ARROW:
            fmt, spec = "arrow", 2
        elif mtype == "application/json":
            fmt, spec = "json", 2
        elif mtype == "application/*":
            fmt, spec = "json", 1
        elif mtype == "*/*":
            fmt, spec = "json", 0
        else:
            continue
        key = (q, spec)
        if key > best_key or (key == best_key and fmt == "json"):
            best, best_key = fmt, key
    return best


def to_arrow_batches(df: DataFrame):
    """S12: Arrow IPC output format (handlers.rs:819-895) — Spark's native
    Arrow collect path replaces the hand-rolled encoder."""
    return df.toArrow()
