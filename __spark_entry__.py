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
from zombi_spark.plans import relational as RQ


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
        # [delegated] relational surface (SURVEY.md §2.4-2.9)
        "pricing_summary": RQ.q_pricing_summary,
        "rollup_agg": RQ.q_rollup_agg,
        "cube_agg": RQ.q_cube_agg,
        "distinct_agg": RQ.q_distinct_agg,
        "approx_distinct": RQ.q_approx_distinct,  # rows-only (HLL)
        "join_inner": RQ.q_join_inner,
        "join_broadcast": RQ.q_join_broadcast,
        "join_multiway": RQ.q_join_multiway,
        "join_semi_anti": RQ.q_join_semi_anti,
        "join_outer": RQ.q_join_outer,
        "join_range": RQ.q_join_range,
        "join_asof": RQ.q_join_asof,
        "window_rank": RQ.q_window_rank,
        "window_analytic": RQ.q_window_analytic,
        "window_running": RQ.q_window_running,
        "set_ops": RQ.q_set_ops,
        "drop_duplicates": RQ.q_drop_duplicates,
        "topk_orders": RQ.q_topk_orders,
        "scalar_library": RQ.q_scalar_library,
        "explode_tokens": RQ.q_explode_array,
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
        # ----------------------------------------- relational surface
        "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_price_cents,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS sum_disc_price_cents,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS sum_charge_cents,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """,
        "rollup_agg": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """,
        "cube_agg": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(sum(l_quantity) AS BIGINT) AS qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """,
        "distinct_agg": """
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS n_orders,
               count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "join_inner": """
        SELECT c_mktsegment, count(*) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "join_broadcast": """
        SELECT r_name AS region_name, count(*) AS n_customers,
               sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS acctbal_cents
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """,
        "join_multiway": """
        SELECT n_name,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS revenue_cents,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY n_name
        """,
        "join_semi_anti": """
        WITH w AS (
          SELECT 'with_orders' AS bucket, c_custkey FROM customer
          WHERE c_custkey IN (SELECT o_custkey FROM orders)
        ), wo AS (
          SELECT 'without_orders' AS bucket, c_custkey FROM customer
          WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        )
        SELECT bucket, count(*) AS n, min(c_custkey) AS min_key
        FROM (SELECT * FROM w UNION ALL SELECT * FROM wo)
        GROUP BY bucket ORDER BY bucket
        """,
        "join_outer": """
        SELECT n_orders, count(*) AS n_customers FROM (
          SELECT c_custkey, count(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        ) GROUP BY n_orders ORDER BY n_orders
        """,
        "join_range": """
        WITH bands(band, lo, hi) AS (
          VALUES (1, 0.0, 500.0), (2, 500.0, 1000.0), (3, 1000.0, 1500.0), (4, 1500.0, 1e9)
        )
        SELECT band, count(*) AS n_parts, min(p_partkey) AS min_part
        FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band ORDER BY band
        """,
        "join_asof": _EV
        + """
        , purchases AS (
          SELECT user_id, timestamp_ms AS p_ts, arrival AS p_arrival
          FROM ev WHERE event_type = 'purchase'
        ), signups AS (
          SELECT user_id, timestamp_ms AS s_ts FROM ev WHERE event_type = 'signup'
        )
        SELECT p.user_id, p.p_ts AS purchase_ts, p.p_arrival, s.s_ts AS last_signup_ts
        FROM purchases p
        ASOF LEFT JOIN signups s ON p.user_id = s.user_id AND s.s_ts <= p.p_ts
        """,
        "window_rank": """
        SELECT o_custkey, o_orderkey, rn, rnk, drnk, quartile FROM (
          SELECT o_custkey, o_orderkey,
                 CAST(row_number() OVER w AS INTEGER) AS rn,
                 CAST(rank() OVER w AS INTEGER) AS rnk,
                 CAST(dense_rank() OVER w AS INTEGER) AS drnk,
                 CAST(ntile(4) OVER w AS INTEGER) AS quartile
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        ) WHERE rn <= 3
        """,
        "window_analytic": """
        SELECT o_custkey, o_orderkey,
               lag(o_orderkey) OVER w AS prev_order,
               lead(o_orderkey) OVER w AS next_order,
               first_value(o_orderkey) OVER wf AS first_order,
               last_value(o_orderkey) OVER wf AS last_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """,
        "window_running": """
        SELECT o_custkey, o_orderkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER wr AS running_cents,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER wm AS moving3_cents,
               count(*) OVER wr AS n_so_far
        FROM orders
        WINDOW wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wm AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "set_ops": """
        WITH custs AS (SELECT c_custkey AS k FROM customer),
             buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
             tagged AS (
               SELECT 'union_all' AS op, k FROM (SELECT k FROM custs UNION ALL SELECT k FROM buyers)
               UNION ALL
               SELECT 'intersect' AS op, k FROM (SELECT k FROM custs INTERSECT SELECT k FROM buyers)
               UNION ALL
               SELECT 'except_all' AS op, k FROM (SELECT k FROM custs EXCEPT ALL SELECT k FROM buyers)
             )
        SELECT op, count(*) AS n, count(DISTINCT k) AS n_distinct
        FROM tagged GROUP BY op ORDER BY op
        """,
        "drop_duplicates": """
        SELECT l_returnflag, count(*) AS n_pairs FROM (
          SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem
        ) GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "topk_orders": """
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
        """,
        "scalar_library": """
        SELECT o_orderkey,
               substr(o_orderpriority, 1, 1) AS prio_code,
               upper(o_orderstatus) AS status_u,
               concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
               CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(floor(abs(o_totalprice - 1000)) AS BIGINT) AS abs_diff_floor,
               CASE WHEN o_totalprice > 1000 THEN 'big' ELSE 'small' END AS size_class,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open
        FROM orders
        """,
        "explode_tokens": """
        SELECT token, count(*) AS n, min(doc_id) AS first_doc FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents WHERE doc_id < 100
        ) GROUP BY token ORDER BY n DESC, token LIMIT 40
        """,
    }
