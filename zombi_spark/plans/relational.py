"""The [delegated] query surface (SURVEY.md §2.4-2.9).

Zombi routes all relational analytics to the external Iceberg engine
(SPEC.md:229-234, 343-352, 767); in this engine these ARE the product,
served by Spark SQL over the tables we produce. The driver's TPC-H-ish
tables stand in for zombi-produced tables (FIXTURES.md §3).

Cross-engine determinism: money aggregates quantize per row to integer
cents (IEEE per-row arithmetic is identical in Spark and DuckDB; only
aggregation ORDER differs, and integer sums are order-exact). Every top-k
ORDER BY carries a unique tiebreaker.

Scale notes per operator are inline; the common ones:
  - dimension joins (nation/region/supplier) are broadcast — no shuffle
    of the fact side (J2);
  - aggregations are expressed so Catalyst plans partial (map-side)
    aggregation before the exchange (A11);
  - top-k compiles to TakeOrderedAndProject, never a global sort (O2/O4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zombi_spark.sources.tables import load_table


def _cents(col: F.Column) -> F.Column:
    """Quantize a money double to integer cents, per row (order-exact sums)."""
    return F.round(col * 100).cast("long")


# --------------------------------------------------------------------- aggs
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A11 flagship (TPC-H Q1 shape): grouped sums/avgs/counts with a
    pushed-down date predicate. Partial aggregation happens map-side; the
    exchange carries one row per (returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_price_cents"),
            F.sum(_cents(disc_price)).alias("sum_disc_price_cents"),
            F.sum(_cents(charge)).alias("sum_charge_cents"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_grouping_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 in one query: ROLLUP + CUBE (DataFrame API) + explicit GROUPING
    SETS (SQL) over (orderstatus, orderpriority), tagged by mode.

    Scan-once shape: count/sum are decomposable, so orders is aggregated
    ONCE at the finest grain — a ~|status|×|priority| frame, persisted —
    and the three grouping modes re-aggregate that tiny frame (Catalyst's
    Expand still runs per mode, but over dozens of rows, not the table).
    Spark has no cross-branch common-subplan elimination, so without the
    persist each union branch would rescan orders: 3 table scans → 1.
    At 100× the data the scan dominates; this keeps it single.

    The persisted base is SESSION-CACHED per (session, sf) — a bare
    per-call persist would pin one more InMemoryRelation per invocation
    for the session lifetime — and the GROUPING SETS branch registers a
    UNIQUE temp-view name: a fixed global name would let a concurrent
    call for a different sf swap the data out from under this call's
    SQL analysis (internally inconsistent merged output, no error)."""
    import uuid as _uuid

    from zombi_spark.plans.plan_cache import session_cache

    cache = session_cache(spark, "relational")
    key = (sf_dir, "grouping_analytics")
    if key in cache:
        return cache[key]
    o = load_table(spark, sf_dir, "orders")
    base = (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("_n"),
            F.sum(_cents(F.col("o_totalprice"))).alias("_cents"),
        )
        .persist()
    )
    aggs = [
        F.sum("_n").alias("n_orders"),
        F.sum("_cents").alias("total_cents"),
    ]
    ro = base.rollup("o_orderstatus", "o_orderpriority").agg(*aggs).select(
        F.lit("rollup").alias("mode"), "o_orderstatus", "o_orderpriority", "n_orders", "total_cents"
    )
    cu = base.cube("o_orderstatus", "o_orderpriority").agg(*aggs).select(
        F.lit("cube").alias("mode"), "o_orderstatus", "o_orderpriority", "n_orders", "total_cents"
    )
    view = f"orders_gs_base_{_uuid.uuid4().hex[:8]}"
    base.createOrReplaceTempView(view)
    gs = spark.sql(
        f"""
        SELECT 'sets' AS mode, o_orderstatus, o_orderpriority,
               sum(_n) AS n_orders,
               sum(_cents) AS total_cents
        FROM {view}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
    # do NOT dropTempView here: Spark uncaches the view's plan on drop —
    # and the view's plan IS the persisted base, so dropping it would
    # silently unpersist the scan-once cache. The whole built query is
    # session-cached, so exactly one view registers per (session, sf).
    # The persisted base + view name are cached alongside so an evictor
    # (e.g. the relational scale smoke, which rebuilds per timed run)
    # can release the InMemoryRelation instead of leaking one per evict.
    cache[key + ("held",)] = (base, view)
    cache[key] = ro.unionByName(cu).unionByName(gs).orderBy(
        "mode",
        F.col("o_orderstatus").asc_nulls_first(),
        F.col("o_orderpriority").asc_nulls_first(),
    )
    return cache[key]


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9, both halves in one plan: exact distinct counts per group AND the
    HLL approx_count_distinct invariant. Sketch estimates are
    engine-specific, so the oracle-checkable output is the exact counts
    plus a boolean asserting each group's HLL estimate landed within its
    documented 5% error bound (the oracle emits `true` — a drifting sketch
    flips the column and fails the hash)."""
    li = load_table(spark, sf_dir, "lineitem")
    # THREE aggregations joined on the 3-row group key, NOT one agg with
    # all three distinct aggregates: mixing the distinct aggs in one agg
    # forces Expand (N× input rows, every non-first agg dragged through
    # it) — measured 18.4s vs 3.7s for the 2-way split at sf0.1, and the
    # remaining Expand×2 inside the exact half cost another 1.20s vs
    # 0.87s split (r16). One countDistinct per agg plans as the two-phase
    # distinct rewrite with NO Expand; each scan reads only its own
    # columns, so total I/O matches the fused plan. The joins are AQE
    # broadcasts over 3 rows. rsd=0.01 keeps every per-group estimate far
    # inside the asserted 5% bound (measured ≤0.9% at sf0.001..0.1); the
    # old single-row variant's rsd=0.05 is a 1σ bound and missed per-group.
    orders = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    # (partkey, suppkey) packed into ONE long before the distinct (guide
    # §2.3 narrower types): the two-phase distinct shuffles the distinct
    # key tuples, and one 8-byte key halves that exchange vs the
    # (long, long) struct — measured 0.93 → 0.75 s on this agg at sf0.1,
    # identical counts. Injective while both keys < 2³²: TPC-H part keys
    # are 200k·SF and supp keys 10k·SF, so the pack is exact to SF ~2×10⁴
    # (far beyond any 100 TB corpus; lineitem at SF 2×10⁴ is ~2×10¹² rows).
    packed = F.col("l_partkey") * F.lit(4294967296).cast("long") + F.col("l_suppkey")
    part_supp = li.groupBy("l_returnflag").agg(
        F.countDistinct(packed).alias("n_part_supp")
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("_approx")
    )
    return (
        orders.join(part_supp, "l_returnflag")
        .join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            "n_orders",
            "n_part_supp",
            (
                F.abs(F.col("_approx") - F.col("n_orders"))
                <= F.lit(0.05) * F.col("n_orders")
            ).alias("approx_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


# -------------------------------------------------------------------- joins
def q_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2/J3 in one plan: the large equi-join orders ⋈ customer
    (sort-merge/shuffled-hash — Catalyst + AQE pick) composed with an
    explicit broadcast of the nation→region dimension chain; the fact side
    never shuffles for the dimension join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dim = n.join(r, n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", F.col("r_name").alias("region_name")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .join(F.broadcast(dim), c.c_nationkey == dim.n_nationkey)
        .groupBy("region_name", "c_mktsegment")
        .agg(F.count("*").alias("n_orders"), F.sum(_cents(F.col("o_totalprice"))).alias("rev_cents"))
        .orderBy("region_name", "c_mktsegment")
    )


def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2 composed (TPC-H Q5 shape, minus the region arm): lineitem⋈
    orders⋈customer⋈supplier⋈nation with broadcast dims and a date
    predicate — nation is the broadcast chain's top; region adds no
    operator not already exercised."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    revenue = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .where(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("revenue_cents"), F.count("*").alias("n_lineitems"))
        .orderBy("n_name")
    )


def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: left_semi + left_anti — customers with vs without orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.lit("with_orders").alias("bucket"), "c_custkey"
    )
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("without_orders").alias("bucket"), "c_custkey"
    )
    return (
        with_orders.unionByName(without)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.min("c_custkey").alias("min_key"))
        .orderBy("bucket")
    )


def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: left outer join keeping order-less customers with NULL counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_orders")
    )


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: non-equi range join — parts priced within a size-derived band.

    Broadcast nested-loop on a small build side; at scale the band table
    stays tiny (one row per band) so this never becomes a cartesian blowup.
    """
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [(1, 0.0, 500.0), (2, 500.0, 1000.0), (3, 1000.0, 1500.0), (4, 1500.0, 1e9)],
        "band int, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), F.min("p_partkey").alias("min_part"))
        .orderBy("band")
    )


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: as-of join — each 'purchase' event enriched with the latest
    'signup'-or-earlier event of the same user at or before its time.

    Spark lacks ASOF JOIN; the scalable composition is union + last_value
    over a time-ordered window partitioned by user — one shuffle on user_id,
    no range self-join blowup. (DuckDB oracle uses native ASOF JOIN.)
    """
    from zombi_spark.plans.event_queries import zombi_events

    ev = zombi_events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("timestamp_ms").alias("p_ts"), F.col("arrival").alias("p_arrival")
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("timestamp_ms").alias("s_ts")
    )
    # union tagged streams; signup rows carry their own ts forward
    tagged = purchases.select(
        "user_id", F.col("p_ts").alias("t"), F.col("p_arrival").alias("p_arrival"),
        F.lit(None).cast("long").alias("s_ts"), F.lit(1).alias("is_p")
    ).unionByName(
        signups.select(
            "user_id", F.col("s_ts").alias("t"), F.lit(None).cast("long").alias("p_arrival"),
            F.col("s_ts").alias("s_ts"), F.lit(0).alias("is_p")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t"), F.col("is_p"))  # signup sorts before purchase at equal ts
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged.withColumn("last_signup_ts", F.last("s_ts", ignorenulls=True).over(w))
    return (
        enriched.where(F.col("is_p") == 1)
        .select("user_id", F.col("t").alias("purchase_ts"), "p_arrival", "last_signup_ts")
    )


# ------------------------------------------------------------------ windows
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 ranking + analytic in one pass: row_number/rank/dense_rank/ntile
    per customer by price, plus lag/lead/first/last over the order-date
    history. Two window specs, one shuffle on o_custkey (the two sorts
    reuse the same partitioning)."""
    o = load_table(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_hist = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w_hist.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w_price).alias("rn"),
            F.rank().over(w_price).alias("rnk"),
            F.dense_rank().over(w_price).alias("drnk"),
            F.ntile(4).over(w_price).alias("quartile"),
            F.lag("o_orderkey").over(w_hist).alias("prev_order"),
            F.lead("o_orderkey").over(w_hist).alias("next_order"),
            F.first("o_orderkey").over(frame).alias("first_order"),
            F.last("o_orderkey").over(frame).alias("last_order"),
        )
        .where(F.col("rn") <= 3)
    )


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 aggregate-over-frame: running totals + moving average (3-row)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cents = _cents(F.col("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("running_cents"),
        F.sum(cents).over(w.rowsBetween(-2, 0)).alias("moving3_cents"),
        F.count("*").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("n_so_far"),
    )


# ------------------------------------------------------------------ set ops
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8: union / intersect / except composed over customer key ranges,
    plus dropDuplicates on a projected lineitem key set — every set
    operator, tagged by op."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    custs = c.select(F.col("c_custkey").alias("k"))
    buyers = o.select(F.col("o_custkey").alias("k")).distinct()
    union_all = custs.unionByName(buyers)
    inter = custs.intersect(buyers)
    minus = custs.exceptAll(buyers)
    dd = (
        li.select("l_orderkey", "l_returnflag")
        .dropDuplicates()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .select(
            F.concat(F.lit("distinct_pairs_"), F.col("l_returnflag")).alias("op"),
            "n",
            F.col("n").alias("n_distinct"),
        )
    )
    return (
        union_all.select(F.lit("union_all").alias("op"), "k")
        .unionByName(inter.select(F.lit("intersect").alias("op"), "k"))
        .unionByName(minus.select(F.lit("except_all").alias("op"), "k"))
        .groupBy("op")
        .agg(F.count("*").alias("n"), F.countDistinct("k").alias("n_distinct"))
        .unionByName(dd)
        .orderBy("op")
    )


# ------------------------------------------------------------- sorts / topk
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below 20%
    of their part's average — a correlated aggregate expressed as a
    self-aggregation join (Catalyst decorrelates the subquery form into
    exactly this plan). avg is exact here: integer-valued double
    quantities sum exactly, and the division is deterministic IEEE."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(avg_qty, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.sum(_cents(F.col("l_extendedprice"))).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


def q_unshipped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 orders by pending revenue for one market
    segment — join + agg + top-k (TakeOrderedAndProject over the agg)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-06-01").cast("timestamp")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("o_orderdate") < cutoff)
            & (F.col("l_shipdate") > cutoff)
        )
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6-adjacent: exact interpolated percentiles per group (the
    reference's histogram/percentile metrics surface,
    metrics/histogram.rs:1-220, computed exactly instead of from buckets).
    Quantized to integer cents per mille to stay hash-comparable: the
    interpolation formula is the same in both engines, and inputs are
    2-decimal doubles, so the per-mille floor is stable.

    The scale-safe product twin is approx_percentile (quantile sketch, no
    full sort per group); its estimate is engine-specific, so the checkable
    output is the invariant column `approx_within_2pct` asserting the
    sketch landed within 2% of the exact value (the oracle emits `true`).
    """
    o = load_table(spark, sf_dir, "orders")
    # ONE percentile aggregate with an array of targets: each separate
    # percentile(col, p) expression maintains its OWN buffer of every
    # group value, so three of them tripled that cost (measured 1.6s →
    # 1.05s warm at sf0.1; the remainder is the one exact buffer + the
    # approx sketch, both inherent); the array form buffers once
    pcts = F.expr("percentile(o_totalprice, array(0.5D, 0.95D, 0.99D))").alias("_pcts")
    approx = F.expr("approx_percentile(o_totalprice, 0.95, 10000)").alias("approx95")
    agg = o.groupBy("o_orderstatus").agg(pcts, approx, F.count("*").alias("n"))
    agg = agg.select(
        "o_orderstatus",
        *[
            F.floor(F.element_at("_pcts", i + 1) * 1000).cast("long").alias(name)
            for i, name in enumerate(("p50_pm", "p95_pm", "p99_pm"))
        ],
        "approx95",
        "n",
    )
    return agg.select(
        "o_orderstatus",
        "p50_pm",
        "p95_pm",
        "p99_pm",
        (
            F.abs(F.col("approx95") * 1000 - F.col("p95_pm")) <= F.lit(0.02) * F.col("p95_pm")
        ).alias("approx_within_2pct"),
        "n",
    ).orderBy("o_orderstatus")


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10-adjacent: pivot linestatus into columns (explicit value list so
    the plan needs no discovery pass; oracle uses CASE sums)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity").cast("long"))
        .withColumnsRenamed({"O": "qty_open", "F": "qty_filled"})
        .orderBy("l_returnflag")
    )


# ------------------------------------------------------------------ scalars
def q_scalar_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: representative scalar surface — string/date/math/conditional —
    chosen for identical cross-engine semantics."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.upper("o_orderstatus").alias("status_u"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").alias("prio_len"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        # floor before cast: Spark's double→long cast truncates while
        # DuckDB's rounds, so make the rounding explicit and portable
        F.floor(F.abs(F.col("o_totalprice") - 1000)).cast("long").alias("abs_diff_floor"),
        F.when(F.col("o_totalprice") > 1000, "big").otherwise("small").alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_or_open"),
    )


def q_explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 array/lateral: split+posexplode document text into tokens
    (UDTF-style expansion via built-in generator, §2.12). The per-token
    POSITION is part of the verified output (earliest 0-based position
    per token) — the positional half of the generator surface is
    hash-checked, not just computed and discarded."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.where(F.col("doc_id") < 100).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").alias("first_doc"),
            F.min("pos").cast("long").alias("first_pos"),
        )
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(40)
    )
