"""Physical-plan quality gates — the 100 TB design assertions.

Correctness tests prove the answers; these prove the *plans*: filters
and projections reach the parquet scan, small dims broadcast instead
of shuffling, and the cross-score never shuffles the big side.
"""

from __future__ import annotations

import pytest

from finalpipeline_spark.queries.registry import load_all

SPECS = load_all()


def _plan(spark, sf_dir, name: str, execute: bool = False) -> str:
    # Scan metadata (DataFilters/PushedFilters) is truncated at
    # maxMetadataStringLength chars; expression IDs grow over a long
    # session, shifting the cut point — widen it so assertions on
    # filter contents are order-independent.
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    df = SPECS[name].fn(spark, sf_dir)
    if execute:  # AQE final plan (codegen spans) exists only post-run
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q1")
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scan, plan
    # Shipdate filter pushed into the parquet scan.
    assert "isnotnull(l_shipdate" in scan[0]
    assert "l_shipdate" in scan[0] and "<=" in scan[0]
    # Column pruning: unused columns (e.g. l_partkey, l_orderkey) not read.
    assert "l_partkey" not in scan[0] and "l_orderkey" not in scan[0]


def test_q1_whole_stage_codegen(spark, sf_dir):
    # AQE wraps the plan lazily; disable it for this check so the
    # codegen spans are visible in the physical plan string.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(spark, sf_dir, "tpch_q1")
        # Codegen stages render as "*(n) Operator" in the tree string.
        assert "*(1)" in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q3_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q3")
    assert "BroadcastHashJoin" in plan
    # The selective segment filter is pushed down to the customer scan.
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_single_fact_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q5")
    # All five dim joins broadcast: exactly one SortMergeJoin/shuffled
    # hash join at most (orders ⋈ lineitem).
    n_smj = plan.count("SortMergeJoin")
    n_bhj = plan.count("BroadcastHashJoin")
    assert n_bhj >= 4, f"expected >=4 broadcast joins, got {n_bhj}\n{plan}"
    assert n_smj <= 1, f"expected <=1 sort-merge join, got {n_smj}\n{plan}"


def test_tanimoto_broadcasts_targets(spark, sf_dir):
    plan = _plan(spark, sf_dir, "chembl_tanimoto_topk")
    # The small target side is broadcast (nested-loop on !=); the big
    # fingerprint side must NOT be exchanged before the join.
    assert "BroadcastNestedLoopJoin" in plan


def test_flagship_no_python_udf(spark, sf_dir):
    # The relational core must stay JVM-side end to end.
    for name in ("flagship_datamart_chain", "tpch_q1", "ref_tie_flag_topk"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_q4_semi_join_with_residual(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q4")
    # EXISTS compiles to a broadcast LEFT SEMI with the non-equi
    # shipped-after-ordered predicate riding on the join, and the date
    # range pushed to the orders scan.
    assert "LeftSemi" in plan, plan
    assert "l_shipdate" in plan.split("LeftSemi")[0].splitlines()[-1] or \
           "l_shipdate" in [ln for ln in plan.splitlines() if "LeftSemi" in ln][0]
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln and "o_orderdate" in ln]
    assert scan and ">=" in scan[0], plan


def test_q16_and_q22_broadcast_anti(spark, sf_dir):
    for name in ("tpch_q16", "tpch_q22"):
        plan = _plan(spark, sf_dir, name)
        anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti and "Broadcast" in anti[0], f"{name}\n{plan}"


def test_q19_or_predicates_push_to_both_scans(spark, sf_dir):
    # Catalyst decomposes the cross-side OR into per-side disjuncts
    # that reach BOTH parquet scans — OR must not defeat pushdown.
    plan = _plan(spark, sf_dir, "tpch_q19")
    li_scan = [ln for ln in plan.splitlines()
               if "FileScan parquet" in ln and "l_quantity" in ln][0]
    p_scan = [ln for ln in plan.splitlines()
              if "FileScan parquet" in ln and "p_brand" in ln][0]
    assert "l_quantity" in li_scan.split("DataFilters")[1], plan
    assert "Brand#12" in p_scan.split("DataFilters")[1], plan


def test_ivf_topk_stays_jvm_side(spark, sf_dir):
    # The whole IVF probe-and-search is built-in SQL — no Python UDF.
    plan = _plan(spark, sf_dir, "emb_ivf_topk")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_anomaly_zscore_broadcasts_stats(spark, sf_dir):
    # Per-type stats (a handful of rows) broadcast back onto the fact:
    # scoring is scan + BHJ — no second wide shuffle of the fact table.
    plan = _plan(spark, sf_dir, "events_anomaly_zscore")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_tfidf_broadcasts_vocab_and_corpus_count(spark, sf_dir):
    # The vocabulary (df) table and the single-row corpus count both
    # broadcast; the only wide exchanges are the explode-side groupBy
    # and the doc-partitioned top-k window.
    plan = _plan(spark, sf_dir, "doc_tfidf_topterms")
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row corpus count
    # Spark 4 pushes the rank<=3 filter into the window sort.
    assert "WindowGroupLimit" in plan, plan


def test_top_ngrams_is_heap_topk_not_full_sort(spark, sf_dir):
    # Global top-k must compile to TakeOrderedAndProject (per-partition
    # heaps), never a full global Sort of the vocabulary.
    plan = _plan(spark, sf_dir, "doc_top_ngrams")
    assert "TakeOrderedAndProject" in plan, plan


def test_cube_single_expand_single_shuffle(spark, sf_dir):
    # CUBE compiles to Expand + one hash aggregate pair — not a union
    # of four scans.
    plan = _plan(spark, sf_dir, "tpch_cube_sales")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Expand" in plan, plan


def test_classifier_is_single_scan_projection(spark, sf_dir):
    # The learned-filter promise: classifier scoring is one codegen'd
    # projection over one scan — no shuffle, no Python in the plan.
    plan = _plan(spark, sf_dir, "doc_quality_classifier")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_grouping_sets_single_expand_single_shuffle(spark, sf_dir):
    # All three grains from one scan: Expand + one agg exchange, not a
    # UNION of per-grain scans.
    plan = _plan(spark, sf_dir, "tpch_grouping_sets")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Expand" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_unpivot_no_extra_shuffle(spark, sf_dir):
    # The melt itself (stack/Expand/Generate) must not add an exchange
    # beyond the wide aggregation's own.
    plan = _plan(spark, sf_dir, "doc_unpivot_lang_counts")
    assert plan.count("FileScan parquet") == 1, plan
    assert plan.count("Exchange") == 1, plan


def test_scd2_single_shuffle_single_window(spark, sf_dir):
    # SCD2 is one hash exchange on the dimension key + one Window — any
    # self-join or second exchange would not survive 100 TB.
    plan = _plan(spark, sf_dir, "orders_scd2_snapshot")
    assert plan.count("Exchange") == 1, plan
    assert "Window" in plan, plan
    assert "Join" not in plan, plan


def test_semdedup_joins_on_bucket_no_cartesian(spark, sf_dir):
    # Candidate pairs come from the bucket equi-join; a cartesian here
    # is the n² trap the clustering exists to avoid.
    plan = _plan(spark, sf_dir, "emb_semantic_dedup")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ewma_single_shuffle(spark, sf_dir):
    # One exchange (user_id window); the Horner fold is per-row.
    plan = _plan(spark, sf_dir, "events_ewma_value")
    assert plan.count("Exchange") == 1, plan
    assert "EvalPython" not in plan, plan


def test_hll_no_python_udf_and_partial_agg(spark, sf_dir):
    """The HLL build must stay JVM-side (md5 + hex fold are codegen
    expressions, not UDFs) and the register max must partial-aggregate
    (executors exchange registers, not keys)."""
    plan = _plan(spark, sf_dir, "lineitem_hll_distinct")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan


def test_cms_sketch_partial_aggregates(spark, sf_dir):
    """The CMS counter build shuffles at most d*w rows per partition —
    the count must combine map-side before the exchange."""
    plan = _plan(spark, sf_dir, "events_cms_heavy_hitters")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial" in plan.lower()


def test_bloom_prefilter_runs_before_join(spark, sf_dir):
    """The bloom membership test must appear as a Filter below the
    exact join, not above it — pruning happens in the scan stage."""
    plan = _plan(spark, sf_dir, "orders_bloom_semi_join")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    join_at = plan.find("BroadcastHashJoin")
    filter_at = plan.find("shiftleft")  # the bit-test expression
    assert join_at != -1 and filter_at != -1
    # tree strings print parents first: the filter (child) appears later
    assert filter_at > join_at


def test_pagerank_iterations_stay_small(spark, sf_dir):
    """The fact join appears once (edge build); the 3 power iterations
    run on node/edge tables only — no repeated fact scans."""
    plan = _plan(spark, sf_dir, "nation_pagerank")
    fact_scans = plan.count("lineitem.parquet")
    assert fact_scans <= 1, f"fact scanned {fact_scans}x"


def test_histogram_bounds_broadcast_not_collected(spark, sf_dir):
    """The min/max bounds row joins back as a broadcast — the plan has
    a BroadcastNestedLoopJoin/BroadcastExchange, no driver collect."""
    plan = _plan(spark, sf_dir, "lineitem_price_histogram")
    assert "Broadcast" in plan


@pytest.mark.parametrize(
    "name",
    [
        "doc_inverted_index",
        "doc_bm25_topk",
        "doc_hybrid_search_rrf",
        "doc_bigram_lm",
        "lineitem_basket_lift",
        "orders_rfm_segments",
        "events_first_touch_attribution",
        "events_last_touch_attribution",
        "events_ohlc_bars",
        "events_gapfill_locf",
        "events_rollup_hierarchy",
        "nation_triangle_count",
        "nation_shortest_paths",
        "doc_weighted_sample_fixed",
        "orders_spend_tiles",
    ],
)
def test_new_query_plan_hygiene(spark, sf_dir, name):
    """Every round-3 query family stays on the fast path: no cartesian
    product, no row-at-a-time Python in the plan, and any global
    ORDER BY+LIMIT compiles to heap top-k (TakeOrderedAndProject),
    never a full global sort feeding a limit."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # GlobalLimit directly over a Sort = the full-sort-then-limit trap
    import re

    assert not re.search(r"GlobalLimit.*\n.*\+- Sort", plan), "full sort before limit"


@pytest.mark.parametrize(
    "name",
    [
        "chembl_tanimoto_lsh_topk",
        "events_forecast_backtest",
        "events_changepoint",
        "events_mad_outliers",
        "events_markov_transitions",
        "fk_integrity_audit",
        "lineitem_benford_audit",
        "orders_gini_revenue",
        "part_skyline",
        "doc_tokenizer_fertility",
        "doc_dedup_containment",
        "lineitem_weighted_median",
        "customer_division_regions",
        "doc_lang_source_contingency",
        "events_top_paths",
        "orders_backlog_sweep",
        "events_ab_test_zscore",
        "orders_median_gap",
        "doc_dup_rate_by_source",
    ],
)
def test_round4_query_plan_hygiene(spark, sf_dir, name):
    """Round-4 families stay on the fast path: no cartesian product, no
    row-at-a-time Python, no full-sort-before-limit."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    import re

    assert not re.search(r"GlobalLimit.*\n.*\+- Sort", plan), "full sort before limit"


def test_tanimoto_lsh_joins_on_band_buckets(spark, sf_dir):
    """The banded Tanimoto search must generate candidates through the
    (band, key) equi-join — never a cross product — and stage the
    signature table once (cached, read in-memory by the band explode
    and both rescore sides)."""
    plan = _plan(spark, sf_dir, "chembl_tanimoto_lsh_topk")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "band" in plan and "key" in plan
    assert "InMemoryTableScan" in plan  # staged signatures, not rescans


def test_forecast_backtest_single_fact_scan(spark, sf_dir):
    """The hourly aggregate feeds four consumers from cache — the fact
    table is scanned exactly once (at cache build)."""
    df = SPECS["events_forecast_backtest"].fn(spark, sf_dir)
    df.collect()  # materialize the scoped cache
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 3  # every consumer cached


def test_backlog_sweep_no_interval_join(spark, sf_dir):
    """The backlog curve must be the sweep line (union of ±1 deltas),
    not an |orders| × |days| interval join."""
    plan = _plan(spark, sf_dir, "orders_backlog_sweep")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Union" in plan  # the two delta arms


def test_skyline_is_window_not_dominance_join(spark, sf_dir):
    """2-D skyline must compile to one window pass (running min), not a
    quadratic self-join dominance test."""
    plan = _plan(spark, sf_dir, "part_skyline")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("SortMergeJoin") == 0
    assert "Window" in plan


@pytest.mark.parametrize(
    "name,allowed_partition_keys",
    [
        ("orders_rfm_segments", ("_pid",)),
        ("lineitem_weighted_median", ("_pid",)),
        ("orders_spend_tiles", ("_pid",)),
        ("orders_gini_revenue", ("_pid",)),
        ("events_funnel_latency", ("_pid",)),
        ("lineitem_abc_analysis", ("_pid",)),
        # the per-customer lag() window is legitimately partitioned by
        # o_custkey; the GLOBAL rank runs per-_pid slice
        ("orders_median_gap", ("_pid", "o_custkey")),
        ("part_skyline", ("_pid",)),
    ],
)
def test_global_rank_scale_path_no_unpartitioned_window(
    spark, sf_dir, name, allowed_partition_keys
):
    """VERDICT r4 item 2 (extended in r5 to every data-sized global
    window): the global-rank/prefix-sum consumers route through the
    two-phase decomposition (operators/rank.py). Every Window in the
    plan must be partitioned — by the range-exchange partition id, or
    by a real data key for the genuinely per-group windows — an
    unpartitioned ntile()/row_number()/sum() OVER (ORDER BY) window
    (one task ranks everything) must not appear anywhere."""
    plan = _plan(spark, sf_dir, name)
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln and "OVER" not in ln]
    assert win_lines, f"expected the per-slice windows in the plan:\n{plan}"
    for ln in win_lines:
        assert any(k in ln for k in allowed_partition_keys), (
            f"unpartitioned window in scale path: {ln}"
        )
    assert "ntile(" not in plan  # tile is offset arithmetic, never ntile


@pytest.mark.parametrize(
    "name",
    ["events_seasonal_decompose", "doc_entropy_by_source", "emb_silhouette"],
)
def test_round5_query_plan_hygiene(spark, sf_dir, name):
    """Round-5 families stay on the fast path: no cartesian product, no
    row-at-a-time Python, no full-sort-before-limit."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    import re

    assert not re.search(r"GlobalLimit.*\n.*\+- Sort", plan), "full sort before limit"


def test_seasonal_decompose_single_fact_scan(spark, sf_dir):
    """The (day, hour) cell aggregate feeds four consumers from cache —
    the events fact is scanned once (at cache build), like
    events_forecast_backtest."""
    df = SPECS["events_seasonal_decompose"].fn(spark, sf_dir)
    df.collect()  # materialize the scoped cache
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 3  # every consumer cached


def test_decontam_substring_bucket_bounded(spark, sf_dir):
    """VERDICT r5 item 7's plan gate: the suffix-level decontamination
    query's candidate generation is a seed-string EQUI-join (frequency-
    capped buckets), never a cartesian, and its gaps-and-islands
    windows are partitioned by (pair, diagonal) — no global window, no
    Python in the plan."""
    plan = _plan(spark, sf_dir, "doc_decontam_substring")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln and "OVER" not in ln]
    assert win_lines, f"expected the islands window in the plan:\n{plan}"
    for ln in win_lines:
        assert "diag" in ln, f"unpartitioned window in decontam path: {ln}"


def test_autocorrelation_series_sized_no_global_window(spark, sf_dir):
    """The ACF query's lag alignment is an equi-join on the hour index;
    the only data-sized operation is the one fact shuffle to hourly
    cells — no window at all, no Python."""
    plan = _plan(spark, sf_dir, "events_autocorrelation")
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
