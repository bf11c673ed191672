"""Physical-plan assertions: the plan shape that survives a 100× scale-up.

Checks Catalyst actually produces what the operator docstrings promise:
filters pushed into the parquet scan, column pruning, broadcast joins for
dims, TakeOrderedAndProject for top-k, partial aggregation, partition
pruning on the EventTable layout (reference analogues X1-X4, SURVEY §4).
"""

import pyspark.sql.functions as F

from zombi_spark.ingest.batch import RAW_EVENT_SCHEMA, prepare_events
from zombi_spark.plans import relational as RQ
from zombi_spark.sources.tables import load_table
from zombi_spark.table.event_table import EventTable


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_to_parquet(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")).select(
        "l_orderkey", "l_quantity"
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plan = _plan(li.select("l_orderkey", "l_extendedprice"))
    # ReadSchema carries only the projected columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_extendedprice" in read_schema
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema


def test_broadcast_join_for_dims(spark, sf_dir):
    plan = _plan(RQ.q_join_dims(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the big (customer) side must not be exchanged for the join
    assert plan.count("BroadcastExchange") >= 1


def test_topk_is_take_ordered(spark, sf_dir):
    # top-k over the join+agg compiles to TakeOrderedAndProject
    # (per-partition top-k, driver merge) — never a global sort+limit
    plan = _plan(RQ.q_unshipped_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_partial_aggregation(spark, sf_dir):
    plan = _plan(RQ.q_pricing_summary(spark, sf_dir))
    # partial (map-side) then final HashAggregate around one exchange
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_covers_agg(spark, sf_dir):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        RQ.q_pricing_summary(spark, sf_dir).explain("codegen")
    assert "WholeStageCodegen" in buf.getvalue()


def test_event_table_partition_pruning(spark, tmp_path):
    """Predicates on event_date prune hive partitions at the scan."""
    rows = [
        ("t", 0, b"x", 1704067200000 + i * 3600_000, None, i) for i in range(48)
    ]  # 2 days × 24 hours
    t = EventTable(spark, str(tmp_path), "events")
    t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    pruned = t.read().where(F.col("event_date") == "2024-01-01")
    plan = _plan(pruned)
    assert "PartitionFilters" in plan
    # only day-1 files are scanned: 24 of 48 rows
    assert pruned.count() == 24


def test_sequence_stats_skipping(spark, tmp_path):
    """Sequence-range predicates reach the parquet scan as pushed filters
    (row-group min/max stats then skip — the Iceberg DataFile-bounds
    analogue, X2)."""
    rows = [("t", 0, b"x", 1704067200000, None, i) for i in range(100)]
    t = EventTable(spark, str(tmp_path), "events")
    t.append(prepare_events(spark.createDataFrame(rows, RAW_EVENT_SCHEMA)))
    df = t.read().where(F.col("sequence") >= 90)
    assert "GreaterThanOrEqual(sequence,90)" in _plan(df)
    assert df.count() == 11


def test_minhash_signatures_single_aggregation_no_explode(spark, sf_dir):
    """MinHash signatures are ONE partial-aggregated groupBy over the
    shingle index: the plan must show no Generate (explode) on the
    signature path — the k seeds are k min() expressions, not k copies of
    the index — and exactly one shuffle (the doc-keyed aggregate). At
    100 TB the difference is shuffling k·|shingles| rows vs |docs| rows."""
    from zombi_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    idx = D.shingle_index(docs, n=2)
    sigs = D.minhash_signatures(docs, num_hashes=12, shingles=idx)
    plan = _plan(sigs)
    # partial+final HashAggregate pair with all 12 partial_min expressions
    # evaluated map-side in one pass
    assert plan.count("partial_min") == 12
    # exactly one explode — the index's shingle Generate; the signature
    # stage must not multiply the index again (the only other Generate is
    # the k-rows-per-doc stack unpivot AFTER the aggregate)
    assert plan.count("Arguments: explode") == 1
    assert "stack" in plan
    # exactly one shuffle: the doc-keyed aggregate exchange (the index's
    # own round-robin repartition is not hash-keyed)
    assert plan.count("Arguments: hashpartitioning") == 1


def test_streaming_dedup_is_single_shuffle_per_key_family(spark, sf_dir):
    """prepare_events plans exactly two exchanges (dedup window + sequence
    window) — both hash-partitioned on the same (topic, partition) family,
    no extra repartitions sneak in."""
    raw = spark.createDataFrame(
        [("t", i % 4, b"x", 1704067200000 + i, f"k{i}", i) for i in range(100)],
        RAW_EVENT_SCHEMA,
    )
    plan = _plan(prepare_events(raw))
    # exchanges: dedup window, sequence window, and the broadcast-less
    # union path; we assert no more than 3 shuffle exchanges total
    assert plan.count("Exchange hashpartitioning") <= 3


def test_ivf_assign_is_pure_projection_no_shuffle(spark, sf_dir):
    """Round-4 IVF: centroid assignment is a per-row projection over the
    scan — NO exchange, NO window, NO join before the cell search."""
    from zombi_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 108))
    plan = _plan(S.ivf_assign(emb, centroids))
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_embedding_near_dup_single_bucket_exchange(spark, sf_dir):
    """Per-bucket BLAS pair scoring keeps the shuffle shape of the old
    self-join: exactly one hash exchange on the bucket id feeding one
    FlatMapGroupsInPandas — and no self-join materializing pair rows."""
    from zombi_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan(S.embedding_near_dup(emb, threshold_e6=350000))
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan


def test_hot_cold_tail_is_top_k_not_global_sort(spark, tmp_path):
    """The hot/cold tail compiles to TakeOrderedAndProject over the
    union — per-partition top-k, no full sort of either tier."""
    from zombi_spark.streaming.ingest import StreamingIngest

    table = EventTable(spark, str(tmp_path), "events")
    table.append(
        prepare_events(
            spark.createDataFrame(
                [("t", 0, b"x", 1704067200000 + i, None, i) for i in range(20)],
                RAW_EVENT_SCHEMA,
            )
        )
    )
    ing = StreamingIngest(spark, str(tmp_path / "landing"), table, str(tmp_path / "ck"))
    plan = _plan(ing.tail("t", limit=10))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_grouping_analytics_scans_orders_once(spark, sf_dir):
    """A10 scan-once shape: rollup+cube+grouping-sets derive from ONE
    persisted fine-grained aggregate — the physical plan reads the orders
    parquet exactly once; the other branches read the cached frame."""
    import contextlib
    import io

    from zombi_spark.plans.relational import q_grouping_analytics

    df = q_grouping_analytics(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # every grouping branch reads the persisted base through the cache
    # (the parquet scan appearing inside each InMemoryRelation repr is
    # the cache's BUILD plan, executed once at materialization)
    assert plan.count("InMemoryTableScan") >= 3, plan
    assert "Expand" in plan  # rollup/cube/sets still exercise A10


def test_perplexity_scoring_broadcasts_the_model(spark, sf_dir):
    """The LM scoring pass must broadcast the (bounded charset³) model to
    BOTH joins and keep the corpus side un-exchanged before them — a
    shuffled model join would move the whole exploded trigram stream."""
    from zombi_spark.plans import pipeline_queries as PQ

    plan = _plan(PQ.q_perplexity_scores(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    # the trigram stream is codegen'd: no interpreted HOF building a
    # string array per doc (explode of an int sequence + substr instead)
    assert "transform(" not in plan.lower().split("== physical plan ==")[-1][:2000]


def test_decontamination_broadcasts_the_benchmark_side(spark, sf_dir):
    """The corpus pays one shingle pass + a broadcast-hash join on the
    shingle; the benchmark side (small by construction) is what moves."""
    from zombi_spark.plans import pipeline_queries as PQ

    plan = _plan(PQ.q_decontamination(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_pii_scrub_is_python_free_single_pass(spark, sf_dir):
    """Detection + redaction are pure Column regexps: no Python workers
    in the plan, and the documents scan happens exactly once."""
    from zombi_spark.plans import pipeline_queries as PQ

    plan = _plan(PQ.q_pii_scrub(spark, sf_dir))
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython
    # exactly one scan node ("formatted" prints each node twice: once in
    # the tree, once as a "(N) Scan parquet" detail header)
    import re

    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1


def test_mixture_census_single_exchange(spark, sf_dir):
    """The sample itself is narrow (pinned in test_mixture); the census
    adds exactly the one hash-aggregate exchange its groupBy needs —
    nothing reshuffles the exploded epoch stream before aggregation."""
    from zombi_spark.plans import pipeline_queries as PQ

    plan = _plan(PQ.q_mixture_epochs(spark, sf_dir))
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    # one partial→final agg exchange + the final orderBy's range exchange
    assert n_exchanges <= 2, plan
