"""Scalar functions of the event model (SURVEY.md §2.9, F1-F10).

Reference semantics:
  - derive_partition_columns: parquet.rs:40-49 — UTC date + hour-of-day
    derived from ``timestamp_ms``; invalid (negative) timestamps clamp to
    epoch.
  - format_partition_date: parquet.rs:52-55 — 'YYYY-MM-DD' rendering.
  - hex sequence keys: rocksdb.rs:386-420 — ``{:016x}`` encoding.
  - UTF-8 lossy payload decode: handlers.rs:775,795.
  - server time default: handlers.rs:709-714.

All are pure Column expressions (JVM-side, whole-stage-codegen friendly);
no Python UDFs on this path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_event_time(ts_ms: Column) -> Column:
    """Epoch-millis long → TIMESTAMP (UTC session time)."""
    return F.timestamp_millis(ts_ms)


def derive_partition_columns(ts_ms: Column) -> tuple[Column, Column]:
    """(event_date DATE, event_hour INT) from epoch millis, UTC.

    Negative timestamps clamp to epoch, matching parquet.rs:44-48.
    """
    clamped = F.greatest(ts_ms, F.lit(0).cast("long"))
    ts = F.timestamp_millis(clamped)
    return F.to_date(ts).alias("event_date"), F.hour(ts).alias("event_hour")


def format_partition_date(event_date: Column) -> Column:
    """DATE → 'YYYY-MM-DD' string (partition path rendering)."""
    return F.date_format(event_date, "yyyy-MM-dd")


def hex_sequence(sequence: Column) -> Column:
    """Sequence → 16-char zero-padded lowercase hex (rocksdb key format)."""
    return F.lower(F.lpad(F.hex(sequence), 16, "0"))


def utf8_payload(payload: Column) -> Column:
    """Binary payload → UTF-8 string for JSON views. The cast wraps the
    bytes without validation JVM-side; invalid sequences surface as
    U+FFFD only at the Arrow/collect boundary — full from_utf8_lossy
    parity (handlers.rs:775,795) holds for every SURFACED value, while
    JVM-side comparisons on invalid UTF-8 see the raw bytes (Spark ships
    no replace-mode decode; strict `decode` would error the query on one
    bad payload, the worse trade for an ingest engine)."""
    return payload.cast("string")


def server_time_ms() -> Column:
    """Current server time in epoch millis — the default event timestamp."""
    return F.unix_millis(F.current_timestamp())
