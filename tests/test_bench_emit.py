"""The headline emit ladder (bench.emit_headline): the r6/r9/r10 class
of artifact bug was a truncated or overgrown headline emitting FALSE
regression signals, so the degradation ladder is pinned — redundancy
drops before gate numbers do, every rung stays parseable JSON under the
tail-capture budget, and the overflow rung is loud, never silent."""

import json

import bench

OPS = [
    "span_dedup",
    "content_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "embedding_near_dup",
    "semantic_dedup",
    "ann_topk",
    "join_dims",
    "sessionization",
    "grouping_analytics",
]


def _real_shaped_inputs():
    """Sized like the real sf0.1 artifact (the shape that exercised the
    flat rung in round 12)."""
    # the r14 headline shape: in-suite/best-probe rates and the static
    # nprobe sweep moved to the detail line; their chars fund the r14
    # gates (dsv2 projection element, dsv2_st, zorder, vis_ms, 5-point
    # load_avg)
    hot = {
        "ing_probes": [[58982, 5.7], [56035, 7.5], [36701, 5.3]],
        "ing_core_s": 6047,
        "app_iso_ms": 1881,
        "compact_iso": [2.28, 5.4],
        "append_p50_ms": 1266,
        # pinned order: [lsh_iso, lsh_cl, ivf_cl, pq_cl, ivfpq_cl] (r15)
        "recall5": [0.675, 0.95, 1.0, 0.95, 0.95],
        "ivfpq": [2.09, 42, 64],
        "ivf_large": [3.15, 1.73, 107, 255, 1],
        "pipe_e2e": [45.7, [5000, 4992, 4920, 4917, 4917, 4269, 4490, 579, 4043]],
        "dsv2": [1.23, 48, 720, 1.68],
        "dsv2_fat": [0.29, 1.19],
        # r15: [mor takedown sec, cow takedown sec, tombstoned count sec]
        "mor": [0.84, 3.12, 0.41],
        "dsv2_st": [4, 3, 61234],
        "zorder": [24, 4, 96, 5.21],
        "vis_ms": [1534.2, 2871.9],
        "tail_ms": [10.0, 154.8],
        "maint": [1440, 720, 6],
        # r15: the regressor re-run adjudication records ride the
        # headline (3 worst candidates, [loop, rerun, load])
        "rq": {
            "hour_group": [0.44, 0.41, 12.2],
            "quality_fe": [0.4, 0.37, 11.8],
            "join_asof": [0.34, 0.3, 9.4],
        },
        "load_avg": [3.8, 4.7, 4.9, 4.6, 5.1],
    }
    # cell values mirror the measured r12 artifact (x10 mostly seconds,
    # one 17s outlier; rows ratios mostly integral) — the budget math is
    # calibrated to THIS shape; a uniformly fatter artifact (every query
    # >10s, every cell >10s) exceeds the tail-capture window at every
    # rung, which no ladder can fix
    x10s = [1.71, 1.4, 8.72, 17.48, 0.58, 0.77, 0.51, 1.27, 1.13, 0.29]
    scale = {}
    for i, op in enumerate(OPS):
        scale[op] = {
            "x1": [0.3134 + i / 7, 0.4268 + i / 9],
            "x10": [x10s[i], x10s[i] * 1.17],
            "rows": 10.0 if i % 3 else 9.728,
        }
    scale["join_dims"]["rows"] = 1.0
    scale["join_dims"]["ord"] = 10.0
    scale["grouping_analytics"]["rows"] = 1.0
    scale["grouping_analytics"]["ord"] = 10.0
    # the REAL 50-query window and its measured r12 values — the budget
    # is calibrated against this exact shape (names average ~13 chars;
    # a window whose every query ran >10s would exceed the tail-capture
    # budget at every rung, which no ladder can fix)
    timings = json.loads(
        '{"ann_topk":0.98,"cohort_retention":0.5,"column_profile":0.79,'
        '"content_dedup":0.43,"decontamination":1.67,"dedup_clusters":0.23,'
        '"distinct_agg":1.49,"embedding_near_dup":0.67,"funnel":0.19,'
        '"grouping_analytics":0.27,"hour_grouping":0.28,"idempotent_dedup":0.24,'
        '"ingest_stats":0.18,"ivf_ann":0.71,"join_asof":0.2,"join_dims":0.34,'
        '"join_multiway":0.53,"join_outer":0.38,"join_range":0.37,'
        '"join_semi_anti":0.27,"json_extraction":1.35,"lang_id":0.3,'
        '"latest_per_key":0.2,"media_frames":0.89,"media_pipeline":0.34,'
        '"minhash_lsh_pairs":0.33,"mixture_epochs":0.18,"ngram_jaccard":1.69,'
        '"percentiles":0.71,"perplexity_scores":2.05,"pii_scrub":1.27,'
        '"pivot":0.27,"pq_ann":0.7,"pricing_summary":0.52,"quality_features":0.38,'
        '"scalar_library":0.43,"semantic_dedup":0.97,"seq_assign":0.27,'
        '"seq_range_scan":0.11,"sessionization":0.63,"set_ops":0.79,'
        '"simhash_near_dup":1.11,"sliding_window":0.24,"span_dedup":0.83,'
        '"tail_read":0.08,"tfidf":0.46,"ts_range_scan":0.16,"unshipped_topk":0.4,'
        '"watermarks":0.27,"window_funcs":0.31}'
    )
    return hot, scale, timings


def test_real_shaped_artifact_keeps_every_gate_under_budget():
    hot, scale, timings = _real_shaped_inputs()
    line = bench.emit_headline(26.1, "/root/testdata/sf0.1", hot, scale, timings, {})
    assert len(line) <= bench._HEADLINE_BUDGET
    d = json.loads(line)
    assert d["sf"] == "sf0.1"
    ex = d["extras"]
    assert "scale_overflow" not in ex  # the flag is a bug to ship
    # every scale op survives, under its alias if the flat rung engaged
    emitted = set(ex["scale"])
    expect = {bench._FLAT_ALIAS.get(op, op) for op in OPS} if ex.get(
        "scale_flat"
    ) else set(OPS)
    assert emitted == expect
    if ex.get("scale_flat"):
        # triples: [x1, x10, rows] (+ ord for the grouped ops); ratios
        # reproducible from the line alone
        jd = ex["scale"]["joins"]
        assert jd[2] == 1 and jd[3] == 10
        assert ex["scale"]["ngram"][2] == 9.73
    # every gate number made it
    for k in (
        "ing_probes",
        "ing_core_s",
        "ivfpq",
        "ivf_large",
        "pipe_e2e",
        "dsv2",
        "dsv2_fat",
        "dsv2_st",
        "zorder",
        "vis_ms",
        "tail_ms",
        "rq",
        "load_avg",
    ):
        assert k in ex, k
    assert "recall5" in ex
    # r15: trim is INCREMENTAL — at the real artifact shape the
    # iso-evidence keys the judge diffs across rounds must survive
    assert "maint" in ex and "app_iso_ms" in ex and "compact_iso" in ex
    assert len(d["queries"]) == 50


def test_small_artifact_keeps_full_run_pairs():
    hot, scale, timings = _real_shaped_inputs()
    small_scale = {op: scale[op] for op in OPS[:3]}
    line = bench.emit_headline(5.0, "/x/sf0.01", hot, small_scale, timings, {})
    d = json.loads(line)
    ex = d["extras"]
    assert "scale_flat" not in ex and "scale_runs" not in ex
    # dict form with BOTH runs per cell (the reproduction companion)
    assert len(ex["scale"]["span_dedup"]["x1"]) == 2


def test_moderate_growth_sheds_derivable_keys_not_scale():
    """The r12 flat line sits ~20 chars under budget; error_count plus
    fatter timings must engage the hot-trim rung (drop keys derivable
    from what remains), NOT cascade into losing the scale block."""
    hot, scale, timings = _real_shaped_inputs()
    slow = {q: s + 10 for q, s in timings.items()}  # every query 5 chars
    line = bench.emit_headline(
        526.1, "/x/sf0.1", hot, scale, slow, {"q1": "err", "q2": "err"}
    )
    assert len(line) <= bench._HEADLINE_BUDGET
    d = json.loads(line)
    ex = d["extras"]
    assert d["error_count"] == 2
    assert "scale" in ex and "scale_overflow" not in ex
    if ex.get("hot_trim"):
        # the shed keys have full-precision detail-line twins
        # (isolated_probes, pipeline_e2e_rows); the gates all survive
        assert ex["ing_probes"]
        assert "app_iso_ms" not in ex
        for k in ("dsv2", "dsv2_fat", "dsv2_st", "zorder", "vis_ms", "ivfpq", "tail_ms"):
            assert k in ex, k
        # the adjudication records survive trim under 10-char prefixes
        assert "rq" in ex and all(len(n) <= 10 for n in ex["rq"])


def test_overflow_is_loud_and_line_stays_parseable():
    hot, scale, timings = _real_shaped_inputs()
    hot["huge_evidence_blob"] = [list(range(40)) for _ in range(10)]
    line = bench.emit_headline(26.1, "/x/sf0.1", hot, scale, timings, {"q": "boom"})
    d = json.loads(line)  # parseable no matter what
    if "scale" not in d["extras"]:
        assert d["extras"].get("scale_overflow") is True
    assert d["error_count"] == 1
