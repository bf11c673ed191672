"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` — one callable per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL for each query (same column
aliases, same row set) for the driver's hash-match correctness gate.

Cross-engine determinism rules used throughout (see tests/test_oracle_parity.py,
which replicates the driver's check locally):
  - every ORDER BY used for top-k has a unique tiebreaker column;
  - no raw TIMESTAMP columns returned — epoch millis (long) or formatted
    strings instead;
  - double aggregates are computed per-row (IEEE-deterministic in any
    engine), quantized to integers per-row, then integer-summed, so the
    aggregation order can't perturb low bits.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from zombi_spark.plans import event_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: watermark recovery —
    per-partition event counts + high/low sequence watermarks (A2-A4)."""
    return EQ.q_high_watermarks(spark, "/root/testdata/sf0.001")


# DuckDB CTE mirroring zombi_spark.plans.event_queries.zombi_events
_EV = """
WITH ev AS (
  SELECT event_id AS arrival,
         'events' AS topic,
         CAST(user_id % 8 AS INTEGER) AS partition,
         props AS payload_str,
         epoch_ms(ts) AS timestamp_ms,
         event_type, value, user_id
  FROM events
)
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "seq_assign": EQ.q_sequence_assign,
        "partition_derive": EQ.q_partition_derive,
        "tail_read": EQ.q_tail_read,
        "seq_range_scan": EQ.q_sequence_range,
        "ts_range_scan": EQ.q_timestamp_range,
        "idempotent_dedup": EQ.q_idempotent_dedup,
        "watermarks": EQ.q_high_watermarks,
        "hour_grouping": EQ.q_hour_grouping,
        "json_extraction": EQ.q_json_extraction,
        "latest_per_key": EQ.q_latest_per_key,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "seq_assign": _EV
        + """
        SELECT topic, partition, arrival,
               CAST(row_number() OVER (PARTITION BY topic, partition ORDER BY arrival) AS BIGINT) AS sequence,
               timestamp_ms
        FROM ev
        """,
        "partition_derive": _EV
        + """
        SELECT arrival, timestamp_ms,
               strftime(make_timestamp(greatest(timestamp_ms, 0) * 1000), '%Y-%m-%d') AS event_date,
               CAST(hour(make_timestamp(greatest(timestamp_ms, 0) * 1000)) AS INTEGER) AS event_hour
        FROM ev
        """,
        "tail_read": _EV
        + """
        SELECT payload_str AS payload, timestamp_ms, arrival
        FROM ev
        WHERE timestamp_ms >= 1705276800000
        ORDER BY timestamp_ms, arrival
        LIMIT 101
        """,
        "seq_range_scan": _EV
        + """
        , seq AS (
          SELECT partition, arrival,
                 CAST(row_number() OVER (PARTITION BY topic, partition ORDER BY arrival) AS BIGINT) AS sequence
          FROM ev
        )
        SELECT partition, sequence, arrival
        FROM seq WHERE partition = 3 AND sequence >= 20
        ORDER BY sequence LIMIT 50
        """,
        "ts_range_scan": _EV
        + """
        SELECT arrival, partition, timestamp_ms, event_type
        FROM ev
        WHERE timestamp_ms >= 1704672000000 AND timestamp_ms < 1704844800000
        ORDER BY timestamp_ms, arrival
        """,
        "idempotent_dedup": _EV
        + """
        , keyed AS (
          SELECT *, user_id::VARCHAR || ':' || event_type AS idempotency_key FROM ev
        )
        SELECT partition, idempotency_key, arrival AS first_arrival
        FROM (
          SELECT *, row_number() OVER (PARTITION BY topic, partition, idempotency_key ORDER BY arrival) AS rn
          FROM keyed
        ) WHERE rn = 1
        """,
        "watermarks": _EV
        + """
        , seq AS (
          SELECT topic, partition,
                 CAST(row_number() OVER (PARTITION BY topic, partition ORDER BY arrival) AS BIGINT) AS sequence
          FROM ev
        )
        SELECT topic, partition,
               max(sequence) AS high_watermark,
               min(sequence) AS low_watermark,
               count(*) AS n_events
        FROM seq GROUP BY topic, partition ORDER BY partition
        """,
        "hour_grouping": _EV
        + """
        SELECT strftime(make_timestamp(timestamp_ms * 1000), '%Y-%m-%d') AS event_date,
               CAST(hour(make_timestamp(timestamp_ms * 1000)) AS INTEGER) AS event_hour,
               count(*) AS n_events,
               count(DISTINCT partition) AS n_partitions
        FROM ev
        GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "json_extraction": _EV
        + """
        SELECT arrival,
               TRY_CAST(json_extract_string(payload_str, '$.k') AS BIGINT) AS k_int64,
               json_extract_string(payload_str, '$.k') AS k_utf8,
               TRY_CAST(json_extract_string(payload_str, '$.missing') AS BIGINT) AS missing_field
        FROM ev
        """,
        "latest_per_key": _EV
        + """
        SELECT user_id, timestamp_ms, event_type, arrival
        FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY timestamp_ms DESC, arrival DESC) AS rn
          FROM ev
        ) WHERE rn = 1
        """,
    }
