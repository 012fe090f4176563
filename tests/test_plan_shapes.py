"""Physical-plan regression pins: the scale-critical plan shapes
documented in PERF.md must not silently degrade."""

from __future__ import annotations

import pytest

from bikes_data_warehouse_etl_spark.plans import QUERIES

EXPECTATIONS = {
    # grouped top-k keeps a per-partition heap, no full sort
    "top3_orders_per_cust": ["WindowGroupLimit"],
    # global top-k never materializes a global sort
    "top_revenue": ["TakeOrderedAndProject"],
    "embedding_topk": ["TakeOrderedAndProject"],
    # CDC and EXISTS compile to the dedicated join types
    "ordr_dtl_fct_cdc": ["LeftAnti"],
    "semi_join_urgent_customers": ["LeftSemi"],
    # dims broadcast
    "cust_dim": ["BroadcastHashJoin"],
    # Q9 shape: every star dim broadcasts, fact scans once
    "profit_by_nation_year": ["BroadcastHashJoin"],
    # Q16 shape: denylist compiles to a broadcast anti join
    "supplier_part_census": ["LeftAnti", "BroadcastHashJoin"],
    # triangle closure is an adjacency-array intersect inside an
    # expression (edge-iterator), never a materialized wedge join —
    # and the adjacency (edge-scale payload) must not broadcast
    "triangle_census": ["array_intersect"],
    # pipe syntax compiles to the same top-k physical plan as ANSI
    "pipe_sql_topk": ["TakeOrderedAndProject"],
    # session-4 additions
    # Q8: part filter + all dims broadcast around the fact chain
    "market_share_promo_asia": ["BroadcastHashJoin"],
    # wedge queries: degree-capped window + anti join + heap (the
    # no-edge-scale-broadcast pin is test_wedge_queries_carry_no_
    # broadcast_hints below)
    "link_prediction_cn": [
        "Window",
        "LeftAnti",
        "TakeOrderedAndProject",
    ],
    "adamic_adar_topk": [
        "Window",
        "LeftAnti",
        "TakeOrderedAndProject",
    ],
    # histogram-first weighted median: part dim broadcasts
    "weighted_median_price": ["BroadcastHashJoin"],
    # Lindley reflection runs as a row-local aggregate() fold over the
    # per-part demand map — one census shuffle, no spine-scale rows
    "inventory_clamped_balance": ["aggregate(sequence("],
    # interval-merge sweep: per-user islands are windows
    "rolling_distinct_users": ["Window"],
    # retrieval eval: both top-10s stay heaps
    "ndcg_bits_eval": ["TakeOrderedAndProject"],
    # critical fractile reads the cumulative histogram window
    "newsvendor_stock": ["Window"],
    # chunked bitmaps join chunk-aligned words via broadcast hash
    "bitset_chunked_overlap": ["BroadcastHashJoin"],
}

FORBIDDEN = {
    # no cartesian products anywhere in the declared suite
    name: ["CartesianProduct"]
    for name in EXPECTATIONS
}
# Q21's two-level aggregate exists to avoid the double-COUNT-DISTINCT
# Expand (3x fact rows) — a regression would reintroduce it silently
EXPECTATIONS["waiting_supplier"] = ["TakeOrderedAndProject"]
FORBIDDEN["waiting_supplier"] = ["CartesianProduct", "Expand"]
# the fold form must never regress to materializing the |parts|x|months|
# spine under a partitioned window (3 spine-scale shuffles at sf10)
FORBIDDEN["inventory_clamped_balance"] = ["CartesianProduct", "Window"]
# fuzzy closure is block-local: ONE bucketed union-find pass, never the
# iterative per-round join+aggregate (3+ edge-scale shuffles at sf10)
EXPECTATIONS["fuzzy_entity_clusters"] = ["FlatMapGroupsInPandas"]
FORBIDDEN["fuzzy_entity_clusters"] = ["CartesianProduct"]
# basket pattern: pairs generated row-locally from collect_set baskets —
# the fact table must never self-join on the order key again (the
# rewritten plan has NO join at all; assoc_rules keeps its two
# item-census joins, so only copurchase pins joinlessness)
EXPECTATIONS["copurchase_pairs"] = ["Generate explode"]
# embedding near-dup scores in-bucket pairs row-locally from a sorted
# basket — vectors must never duplicate through a pair JOIN again
# (~30 GB of array bytes at sf10)
EXPECTATIONS["embedding_neardup"] = ["Generate explode"]
# curation dedup is a min_by aggregate on a thin projection with
# map-side combine (struct min_by lowers to SortAggregate) — a
# regression to the row_number window re-shuffles full document bodies
EXPECTATIONS["curated_corpus"] = ["partial_min_by"]
FORBIDDEN["curated_corpus"] = ["CartesianProduct", "Window"]
FORBIDDEN["embedding_neardup"] = [
    "CartesianProduct",
    "SortMergeJoin",
    "BroadcastHashJoin",
]
FORBIDDEN["copurchase_pairs"] = [
    "CartesianProduct",
    "SortMergeJoin",
    "BroadcastHashJoin",
]
# round-6 span census: the global-frequency step is a window over the
# REDUCED per-(doc,span) counts — the dup-set+join-back form re-ran
# the tokenize/explode scan once per consumer (measured 2x at every
# sf) and would reappear as a join in the plan
EXPECTATIONS["dup_span_fraction"] = ["Generate explode", "Window"]
FORBIDDEN["dup_span_fraction"] = [
    "CartesianProduct",
    "SortMergeJoin",
    "BroadcastHashJoin",
]
# round-6 semantic dedup: candidate pairs come from the basket form
# (row-local in-bucket pair generation) — vectors must never duplicate
# through a pair SortMergeJoin; the only joins are the 3-row tau frame
EXPECTATIONS["semantic_dedup_curve"] = ["Generate explode"]
FORBIDDEN["semantic_dedup_curve"] = ["CartesianProduct", "SortMergeJoin"]
# round-6 bloom decontam: the benchmark side must reach the corpus as
# a PACKED BITMAP (shiftleft/bit_or build, shiftright probe through a
# broadcast) and the kept set must stay an anti join — a regression to
# broadcasting the exact shingle set would drop the shift expressions
EXPECTATIONS["bloom_decontam_keep"] = [
    "shiftleft",
    "shiftright",
    "bit_or",
    "LeftAnti",
]
FORBIDDEN["bloom_decontam_keep"] = ["CartesianProduct"]
# round-6 session 3: the shared co-order edge build ships pairs as ONE
# packed long (shiftleft(a,32)+b) through the widest exchange of the
# graph family — a regression to the struct form doubles the key bytes.
# Pinned on degree_distribution (triangle_census lazily checkpoints the
# edge set, which replaces the upstream plan text with a LogicalRDD).
EXPECTATIONS["degree_distribution"] = ["shiftleft", "shiftright"]
FORBIDDEN["degree_distribution"] = ["CartesianProduct"]
# minhash_accuracy verifies ONLY candidates: the candidate doc-id set
# must come back onto the documents scan as a broadcast semi join — the
# unrestricted corpus-wide shared-shingle self-join was ~70% of a 45 s
# sf10 wall
EXPECTATIONS["minhash_accuracy"] = ["LeftSemi"]
FORBIDDEN["minhash_accuracy"] = ["CartesianProduct"]
EXPECTATIONS["lsh_band_curve"] = ["LeftSemi"]
FORBIDDEN["lsh_band_curve"] = ["CartesianProduct"]
# batch 67: refresh merge dedups via min_by-style struct min + quota
# window — no join anywhere (bodies reduced to hashes before any
# exchange); vocab drift pivots with conditional aggs, never a
# vocab self-join
EXPECTATIONS["corpus_refresh_merge"] = ["xxhash64", "Window"]
FORBIDDEN["corpus_refresh_merge"] = [
    "CartesianProduct",
    "SortMergeJoin",
    "BroadcastHashJoin",
]
EXPECTATIONS["snapshot_vocab_drift"] = ["Window"]
FORBIDDEN["snapshot_vocab_drift"] = ["CartesianProduct", "SortMergeJoin"]
# hard-negative mining: the query sample reaches the corpus as a
# broadcast nested-loop (explicit crossJoin(broadcast(q)) — the scored
# matrix is reduced map-side and never shuffles)
EXPECTATIONS["hard_negative_margin"] = ["BroadcastNestedLoopJoin"]
FORBIDDEN["hard_negative_margin"] = ["CartesianProduct", "SortMergeJoin"]
# fuzzy_match_stats rides the clusters' numpy bucket path — whole
# blocks by 128-way hash into applyInPandas; a regression to the
# pair-materializing self-join (51.7 s vs ~13 s at sf10) would
# reintroduce a join
EXPECTATIONS["fuzzy_match_stats"] = ["FlatMapGroupsInPandas"]
FORBIDDEN["fuzzy_match_stats"] = [
    "CartesianProduct",
    "SortMergeJoin",
    "BroadcastHashJoin",
]


def _plan(spark, sf_dir, name: str) -> str:
    return (
        QUERIES[name]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_plan_contains_expected_operators(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    for needle in EXPECTATIONS[name]:
        assert needle in plan, f"{name}: expected {needle} in physical plan"
    for needle in FORBIDDEN[name]:
        assert needle not in plan, f"{name}: {needle} must not appear"


@pytest.mark.parametrize("name", ["link_prediction_cn", "adamic_adar_topk"])
def test_wedge_queries_carry_no_broadcast_hints(spark, sf_dir, name):
    """The wedge-census pair must never STATICALLY broadcast an
    edge-scale side (adjacency / edge set grow with the fact table;
    a hinted broadcast OOMs executors at 100 TB). Zero ResolvedHint
    in the optimized logical plan, and with the auto-broadcast
    threshold disabled the physical plan holds zero BroadcastExchange
    — proving every broadcast these queries ever get is AQE's
    runtime-size decision, not a compiled-in hint."""
    from bikes_data_warehouse_etl_spark.plans import QUERIES

    logical = str(
        QUERIES[name].spark(spark, sf_dir)._jdf.queryExecution().optimizedPlan()
    )
    assert "ResolvedHint" not in logical
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastExchange" not in plan
        assert "CartesianProduct" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_wedge_degree_cap_bounds_the_self_join(spark):
    """On a hub graph (one center adjacent to everyone) the capped
    adjacency keeps exactly CAP neighbors for the hub — the wedge
    self-join is |V|·CAP²/2-bounded no matter how skewed the graph —
    and the kept subset is the deterministic hash-rank prefix."""
    import pyspark.sql.functions as F

    from bikes_data_warehouse_etl_spark.plans.pipeline_ops16 import (
        _HASH_MOD,
        _HASH_MULT,
        capped_adjacency,
        symmetric_adjacency,
    )

    n = 200
    e = spark.createDataFrame(
        [(0, i) for i in range(1, n + 1)], "a long, b long"
    )
    adj = capped_adjacency(symmetric_adjacency(e), cap=16)
    hub = adj.where(F.col("v") == 0)
    kept = sorted(r["u"] for r in hub.collect())
    assert len(kept) == 16
    expected = sorted(
        range(1, n + 1), key=lambda u: ((u * _HASH_MULT) % _HASH_MOD, u)
    )[:16]
    assert kept == sorted(expected)
    # spokes have degree 1 -> cap is inert for them
    assert adj.where(F.col("v") != 0).count() == n


def test_sample_stratified_is_scan_local(spark, sf_dir):
    """Deterministic sampling must stay a row-local filter: zero
    exchanges, zero aggregates — the property that makes it free at
    100 TB."""
    plan = _plan(spark, sf_dir, "sample_stratified")
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan


def test_top_terms_word_count_shape(spark, sf_dir):
    """The word count must partial-aggregate map-side (two
    HashAggregates around exactly one shuffle, which then carries
    (term, partial_n) pairs, not raw tokens) and take the top-k with
    a per-partition heap, never a global sort."""
    plan = _plan(spark, sf_dir, "top_terms")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") == 2
    assert "Sort " not in plan  # no global sort operator


def test_retention_has_no_self_join(spark, sf_dir):
    """Retention is a LAG over the per-user week sequence — one
    distinct, one window, one roll-up. The naive wau ⋈ wau self-join
    shape (7 exchanges, distinct computed twice) must not creep back."""
    plan = _plan(spark, sf_dir, "user_retention_weekly")
    assert "Join" not in plan
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pushdown_scan")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # column pruning: the scan must not read all 11 lineitem columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" not in read_schema and "l_tax" not in read_schema


def test_revenue_rollup_customer_join_is_aqe_chosen(spark, sf_dir):
    """customer must NOT be hint-broadcast (it scales with the fact
    side); nation/region hints stay. The initial plan therefore keeps a
    non-broadcast join for customer, and AQE may convert it at runtime."""
    plan = _plan(spark, sf_dir, "revenue_by_region_quarter")
    assert "AdaptiveSparkPlan" in plan
    # hinted bounded dims still compile to broadcast joins
    assert "BroadcastHashJoin" in plan
    from pyspark.sql import functions as F  # noqa: F401
    from bikes_data_warehouse_etl_spark.plans import QUERIES

    logical = str(
        QUERIES["revenue_by_region_quarter"]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
    )
    # exactly two residual broadcast hints (nation, region) — none on customer
    assert logical.count("ResolvedHint") <= 2


def test_fuzzy_pairs_blocking_key_multiplies_blocks(spark, sf_dir):
    """Composite blocking key must yield >> 25 blocks (nation-only
    capped parallelism at 25 tasks regardless of cluster size)."""
    import pyspark.sql.functions as F
    from bikes_data_warehouse_etl_spark.sources.parquet import read_table

    c = read_table(spark, sf_dir, "customer")
    n_blocks = (
        c.select("c_nationkey", F.substring("c_name", 15, 2).alias("blk"))
        .distinct()
        .count()
    )
    assert n_blocks > 25


def test_active_orders_sweep_window_is_post_aggregation(spark, sf_dir):
    """The running-sum window must consume the per-day aggregate (|days|
    rows), never the per-order delta stream: exactly one Window, fed by
    a HashAggregate on day, and the lineitem reduction partial-aggs
    map-side before its shuffle."""
    plan = _plan(spark, sf_dir, "active_orders_daily")
    assert plan.count("Window") >= 1
    assert "HashAggregate" in plan
    # window input is the day-grouped aggregate: the single-partition
    # exchange appears after aggregation, so it moves |days| rows
    agg_pos = plan.index("HashAggregate")
    win_pos = plan.index("Window")
    assert win_pos < agg_pos  # plan prints top-down: Window above its agg


def test_event_transition_normalisation_is_on_matrix(spark, sf_dir):
    """The per-prev normalisation window runs over the 25-row
    transition matrix, not the raw events: exactly three hash
    exchanges — user_id for LAG (the only one that moves event-scale
    data), then (prev,next) for the map-side-combined count and
    prev_type for the window, both over |event_types|²-row inputs."""
    plan = _plan(spark, sf_dir, "event_transition_matrix")
    assert plan.count("Exchange hashpartitioning") == 3
    assert "CartesianProduct" not in plan


def test_pii_scrub_is_scan_local(spark, sf_dir):
    """Redaction must stay row-local codegen: zero exchanges, zero
    aggregates, zero Python — the property that makes it free at
    100 TB."""
    plan = _plan(spark, sf_dir, "pii_scrub_stats")
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan
    assert "Python" not in plan


def test_dedup_keep_best_single_exchange_no_text(spark, sf_dir):
    """row_number and the cluster-size count share one window spec →
    one Exchange on the 64-bit fp; the shuffled schema must not carry
    the document text."""
    plan = _plan(spark, sf_dir, "dedup_keep_best")
    assert plan.count("Exchange hashpartitioning") == 1
    shuffled = plan.split("Exchange hashpartitioning")[1].splitlines()[0]
    assert "text" not in shuffled


def test_winsorize_windows_run_on_histogram(spark, sf_dir):
    """Percentile selection must consume the (seg, cents) histogram,
    not raw orders: the Window sits above a HashAggregate, the
    5-row threshold join broadcasts, and no sort of the raw table
    appears (the only Sort is the window's per-partition histogram
    sort)."""
    plan = _plan(spark, sf_dir, "winsorized_price_stats")
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    win_pos = plan.index("Window")
    agg_pos = plan.index("HashAggregate", win_pos)
    assert agg_pos > win_pos  # top-down print: histogram agg feeds the window


def test_bigram_pmi_topk_and_no_cartesian(spark, sf_dir):
    """Top-50 selection must be TakeOrderedAndProject (per-partition
    heaps, no global sort); the 1-row totals join is a broadcast
    nested loop, never a CartesianProduct."""
    plan = _plan(spark, sf_dir, "bigram_pmi_top")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_event_drift_single_event_scale_shuffle(spark, sf_dir):
    """Exactly one hash exchange moves event-scale data (the
    event_type aggregate); the share windows run single-partition
    over the |event_types|-row profile."""
    plan = _plan(spark, sf_dir, "event_drift")
    assert plan.count("Exchange hashpartitioning") == 1


def test_incremental_merge_is_two_level_agg(spark, sf_dir):
    """Daily partials then monthly merge: two aggregate pairs, no
    join, no window — the decomposable-stats merge shape."""
    plan = _plan(spark, sf_dir, "incremental_agg_merge")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_train_split_no_text_in_shuffle(spark, sf_dir):
    """The distinct-cluster count shuffles (split, lang, fp) — the
    64-bit fingerprint, never the document text."""
    plan = _plan(spark, sf_dir, "train_split_assign")
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line


def test_salted_join_shuffles_on_salted_key(spark, sf_dir):
    """The join key must be (l_orderkey, __salt__) — a hot order key
    spreads over the salt space — and the salt is gone from the
    output schema."""
    q = QUERIES["salted_join_revenue"].spark(spark, sf_dir)
    assert "__salt__" not in q.columns
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "__salt__" in plan  # participates in the join/exchange keys


def test_two_phase_agg_has_three_aggregate_levels(spark, sf_dir):
    """Partial-by-(key, salt) then final-by-key: the plan carries two
    exchange stages (salted, then key-only), each with map-side
    partial aggregation."""
    plan = _plan(spark, sf_dir, "two_phase_agg_supplier")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "__salt__" in plan


def test_oov_vocab_is_broadcast_topk(spark, sf_dir):
    """The vocabulary must be TakeOrderedAndProject (top-1000, no
    global sort) and join back via BroadcastHashJoin — the corpus
    side never shuffles for membership tagging."""
    plan = _plan(spark, sf_dir, "oov_rate")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_boilerplate_topk_no_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "boilerplate_shingles")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_cdc_full_diff_is_fullouter_sortmerge(spark, sf_dir):
    """Snapshot diff joins two fact-sized sides: FULL OUTER must stay a
    shuffle join (Spark cannot broadcast a full outer hash join on the
    build side of fact data) and never a nested-loop/cartesian."""
    plan = _plan(spark, sf_dir, "cdc_full_diff")
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_percentile_rank_window_runs_on_histogram(spark, sf_dir):
    """The per-lang percent-rank must be derived from the
    (lang, n_chars) histogram — Window above a HashAggregate — and the
    rank table must broadcast back to the raw rows (no second shuffle
    of the documents table)."""
    plan = _plan(spark, sf_dir, "percentile_rank_chars")
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    win_pos = plan.index("Window")
    assert plan.index("HashAggregate", win_pos) > win_pos


def test_source_quota_cap_single_exchange(spark, sf_dir):
    """The per-source rank needs exactly one hash exchange (on
    source); the ranked filter is a WindowGroupLimit-eligible
    rk <= K predicate over that single shuffle."""
    plan = _plan(spark, sf_dir, "source_quota_cap")
    assert plan.count("Exchange hashpartitioning") == 1


def test_dedup_savings_no_text_in_shuffle(spark, sf_dir):
    """Both aggregation levels (per-fp, then per-cluster-size) shuffle
    fixed-width longs only — the document text is consumed by the
    fingerprint projection inside the scan stage and never moves."""
    plan = _plan(spark, sf_dir, "dedup_savings")
    assert plan.count("Exchange hashpartitioning") == 2
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line


def test_zorder_interleave_is_codegen_no_python(spark, sf_dir):
    """The Morton interleave must be pure JVM integer arithmetic
    (whole-stage codegen, no Python evaluation) feeding one
    map-side-combined shuffle over ≤64 bucket keys."""
    plan = _plan(spark, sf_dir, "zorder_locality")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_embedding_norms_fold_without_explode(spark, sf_dir):
    """The squared-norm reduction is a higher-order aggregate over the
    array column — no Generate/explode stage (contrast
    label_centroids, which must explode for per-dimension outputs)."""
    plan = _plan(spark, sf_dir, "embedding_norm_stats")
    assert "Generate" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_cogroup_uses_arrow_cogroup(spark, sf_dir):
    """The as-of extension point must compile to the Arrow cogroup
    operator, with the view side pre-aggregated (HashAggregate below
    the cogroup) so pandas sees the minimal frame."""
    plan = _plan(spark, sf_dir, "asof_cogroup")
    assert "FlatMapCoGroupsInPandas" in plan
    assert "HashAggregate" in plan


def test_grouping_sets_expand_before_single_shuffle(spark, sf_dir):
    """Grouping sets must compile to the Expand operator (map-side row
    multiplication for all requested levels) feeding ONE hash exchange
    — never one aggregate per set; dimension joins broadcast."""
    plan = _plan(spark, sf_dir, "grouping_sets_revenue")
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan


def test_session_paths_one_event_scale_shuffle(spark, sf_dir):
    """Sessionize + both LAG windows must share a single user_id
    exchange (hash partitioning on user_id satisfies the (user_id,
    sess) clustering — only a Sort is inserted); the second exchange
    is the ≤|types|³-key trigram aggregate."""
    plan = _plan(spark, sf_dir, "session_paths")
    ex = [
        line
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    ]
    assert len(ex) == 2
    assert sum("user_id" in line for line in ex) == 1


def test_pit_dim_join_fact_never_shuffles(spark, sf_dir):
    """The point-in-time join must broadcast the versioned dim: zero
    hash exchanges — the fact flows scan→join→project untouched."""
    plan = _plan(spark, sf_dir, "pit_dim_join")
    assert plan.count("Exchange hashpartitioning") == 0
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_copurchase_no_cartesian_bounded_fanout(spark, sf_dir):
    """The basket self-join must stay an equi-join on the order key
    (fan-out bounded by basket size), never a cartesian/NLJ."""
    plan = _plan(spark, sf_dir, "copurchase_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quantile_audit_sketch_and_broadcast_certify(spark, sf_dir):
    """Both sketches compute in one grouped pass over the fact; the
    rank certification joins the |priorities|-row stats back via
    broadcast — two hash exchanges total, both on the tiny priority
    key."""
    plan = _plan(spark, sf_dir, "quantile_sketch_audit")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "BroadcastHashJoin" in plan


def test_source_rebalance_rates_broadcast_back(spark, sf_dir):
    """The rate table must broadcast back to the corpus (the keep
    decision is row-local); the MAX-normalization window runs on the
    |sources|-row aggregate (one SinglePartition exchange of tiny
    data), never on the corpus."""
    plan = _plan(spark, sf_dir, "source_rebalance_sample")
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("Exchange SinglePartition") == 1


def test_vocab_curve_window_on_vocabulary(spark, sf_dir):
    """Term counting must map-side combine through one hash exchange;
    the ranking window consumes the vocabulary-sized aggregate via a
    single-partition exchange — corpus rows never sort globally."""
    plan = _plan(spark, sf_dir, "vocab_coverage_curve")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1
    win_pos = plan.index("Window")
    assert plan.index("HashAggregate", win_pos) > win_pos


def test_quant_error_fold_no_explode(spark, sf_dir):
    """The quantization-error reduction folds the array in place — no
    Generate stage, no Python evaluation, one (label, long) shuffle."""
    plan = _plan(spark, sf_dir, "embedding_quant_error")
    assert "Generate" not in plan
    assert "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_null_skew_join_routes_nulls_around_join(spark, sf_dir):
    """The null-key branch must bypass the join via Union — no hash
    exchange anywhere at test scale (dim broadcasts), and never a
    cartesian. The semantic proof is the oracle hash vs the plain
    left join."""
    plan = _plan(spark, sf_dir, "null_skew_join")
    assert "Union" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 0
    assert "CartesianProduct" not in plan


def test_late_arrival_running_max_on_blocks(spark, sf_dir):
    """The running max must consume the per-minute block aggregate
    (Window above a HashAggregate, via one SinglePartition exchange of
    block rows) and broadcast back — raw events never sort globally."""
    plan = _plan(spark, sf_dir, "late_arrival_profile")
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange SinglePartition") == 1
    win_pos = plan.index("Window")
    assert plan.index("HashAggregate", win_pos) > win_pos


def test_heavy_hitters_sketch_prune(spark, sf_dir):
    """Pass 2's plan must be a single token scan (one Generate) gated
    by a broadcast semi-join on the heavy-bucket list — the full
    vocabulary must never sort or range-partition. (Pass 1 is the
    separate bounded 8 192-bucket sketch job.)"""
    plan = _plan(spark, sf_dir, "heavy_hitter_tokens")
    assert plan.count("Generate") == 1
    assert "LeftSemi" in plan
    assert "BroadcastExchange" in plan
    assert "Exchange rangepartitioning" not in plan


def test_range_split_planner_histogram_only(spark, sf_dir):
    """Split points must come from the bounded value histogram — no
    range partitioning / global sort of the fact, no sampling; the
    15-target join is a broadcast loop over ~600 histogram rows."""
    plan = _plan(spark, sf_dir, "range_split_planner")
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "HashAggregate" in plan


def test_ship_sla_window_on_histogram(spark, sf_dir):
    """The percentile window must consume the (prio, day) histogram
    aggregate, never the raw joined fact rows."""
    plan = _plan(spark, sf_dir, "ship_sla_percentiles")
    assert "Window" in plan
    win_pos = plan.index("Window")
    assert "HashAggregate" in plan[win_pos:]
    assert "CartesianProduct" not in plan


def test_trade_matrix_dual_role_broadcast(spark, sf_dir):
    """nation joins in two roles — both must be broadcast build sides;
    no cartesian anywhere in the 6-table join."""
    plan = _plan(spark, sf_dir, "nation_trade_matrix")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_join_size_estimate_never_joins_rows(spark, sf_dir):
    """Both the sketch and the exact cardinality must come from
    joined COUNT aggregates — four scans total (2 per fact), and the
    fact rows themselves are never row-joined; the only Cross is the
    two single-row results meeting."""
    plan = _plan(spark, sf_dir, "join_size_estimate")
    assert plan.count("FileScan") == 4
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_last_touch_window_no_global_sort(spark, sf_dir):
    """The per-user ordered walk must be a partitioned Window (sort
    within user partitions), never a global range sort."""
    plan = _plan(spark, sf_dir, "last_touch_attribution")
    assert "Window" in plan
    assert "Exchange rangepartitioning" not in plan


def test_negative_samples_anti_join_on_distinct(spark, sf_dir):
    """Candidate rejection must be a LeftAnti against the
    distinct-reduced purchase pairs (aggregate below the anti join),
    with candidate generation explode row-local."""
    plan = _plan(spark, sf_dir, "negative_samples")
    assert "LeftAnti" in plan
    assert "Generate" in plan
    assert "CartesianProduct" not in plan


def test_deletion_cascade_single_plan(spark, sf_dir):
    """All three cascade levels must live in ONE lazy plan — a Union
    of per-level conditional aggregates (partial+final pairs), with
    the deletion list applied as a broadcast mark, never a per-level
    collect (the 11.5 s → 1.5 s rewrite in PERF.md)."""
    plan = _plan(spark, sf_dir, "deletion_cascade_audit")
    assert "Union" in plan
    assert plan.count("HashAggregate") >= 6
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_min_cost_supplier_single_aggregate(spark, sf_dir):
    """The Q2-style min-per-group element selection must be ONE
    aggregate over one partkey shuffle (struct-min decorrelation) —
    never the join-back form, which would show a second Exchange and
    a SortMergeJoin of the fact against itself."""
    plan = _plan(spark, sf_dir, "min_cost_supplier")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_revenue_share_single_fact_scan(spark, sf_dir):
    """Q11's global-total scalar must be a window over the ≤25-row
    nation rollup, not a second fact scan: exactly one lineitem scan
    and the nation dim broadcast."""
    plan = _plan(spark, sf_dir, "revenue_share_nations")
    assert plan.count("lineitem.parquet") <= 1
    assert "BroadcastHashJoin" in plan


def test_top_supplier_single_fact_scan(spark, sf_dir):
    """Q15's max-with-ties must derive the global max from the
    per-supplier rollup (window over the rollup), scanning lineitem
    exactly once — the scalar-subquery form scans it twice."""
    plan = _plan(spark, sf_dir, "top_supplier_revenue")
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan


def test_rich_inactive_pushdown_and_anti(spark, sf_dir):
    """Q22's NOT EXISTS must be a LeftAnti with the recency predicate
    pushed into the orders scan (PushedFilters), and the scalar
    average applied via broadcast, not a rescan."""
    plan = _plan(spark, sf_dir, "rich_inactive_customers")
    assert "LeftAnti" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_pricing_summary_map_side_combine(spark, sf_dir):
    """Q1 must partial-aggregate map-side (two HashAggregates around
    exactly one shuffle) with the cutoff pushed to the scan."""
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange hashpartitioning") == 1
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_shipping_priority_heap_topk(spark, sf_dir):
    """Q3's LIMIT 10 must be TakeOrderedAndProject (per-partition
    heaps), with all three filters pushed below the joins."""
    plan = _plan(spark, sf_dir, "shipping_priority")
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "GreaterThan(l_shipdate" in plan


def test_late_order_priority_semi_join(spark, sf_dir):
    """Q4's EXISTS-with-inequality must compile to ONE LeftSemi join
    (no DISTINCT pass, no second aggregate over lineitem)."""
    plan = _plan(spark, sf_dir, "late_order_priority")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_forecast_delta_full_pushdown(spark, sf_dir):
    """Q6 must push all predicates into the scan and read only the
    needed columns — the purest pushdown + column-pruning pin."""
    plan = _plan(spark, sf_dir, "forecast_revenue_delta")
    # PushedFilters prints truncated; the leading entries prove the
    # predicates reached the scan (full list checked via DataFilters)
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)" in plan
    assert "(l_quantity#" in plan and "< 24.0)" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" not in read_schema and "l_orderkey" not in read_schema


def test_returned_items_heap_topk_no_customer_broadcast(spark, sf_dir):
    """Q10: top-20 via TakeOrderedAndProject; nation broadcasts but
    customer must NOT be forced broadcast (fact-scaled at 100 TB) —
    at sf0.01 AQE may still choose it, so pin only the absence of a
    static broadcast *hint* by checking the returnflag filter pushed
    and the heap top-k."""
    plan = _plan(spark, sf_dir, "returned_items_topk")
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_doc_chunks_overlap_zero_shuffle(spark, sf_dir):
    """Chunking is row-local document→sample expansion: one Generate
    (the window-start explode), ZERO exchanges at any corpus size."""
    plan = _plan(spark, sf_dir, "doc_chunks_overlap")
    assert "Generate" in plan
    assert "Exchange hashpartitioning" not in plan


def test_interval_join_is_equi_not_cartesian(spark, sf_dir):
    """The trailing-hour interval join must plan as an EQUI join on
    user_id with the time range as residual — a range-only join would
    degrade to BroadcastNestedLoop/Cartesian and die at scale."""
    plan = _plan(spark, sf_dir, "interval_join_purchases")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rolling_7d_uses_range_frame_over_bounded_domain(spark, sf_dir):
    """The rolling sum must be a RANGE frame (value distance — calendar
    gaps shorten the window) running AFTER the (seg × day) aggregate."""
    plan = _plan(spark, sf_dir, "rolling_7d_revenue")
    assert "RANGE BETWEEN" in plan or "RangeFrame" in plan
    # window input is the pre-aggregated domain: agg exchange below window
    assert plan.count("Exchange hashpartitioning") == 2


def test_pagerank_edges_materialized_once(spark, sf_dir):
    """The rank iterations must read the checkpointed edge set (RDD
    scans), not re-run the order-level self-join per consumer: the
    un-checkpointed plan had 18 exchanges, the materialized one ≤ 8."""
    plan = _plan(spark, sf_dir, "pagerank_suppliers")
    assert "Scan ExistingRDD" in plan
    assert plan.count("Exchange hashpartitioning") <= 8


def test_assoc_rules_checkpoint_is_lazy(spark, sf_dir):
    """The basket frame feeds three consumers via a LAZY localCheckpoint
    (`assoc_rules_topk`): an eager checkpoint materializes the
    fact-scale collect_set shuffle at BUILD time even when the caller
    only wants .explain(), and the round-6 sf10 ABBA measured
    lazy-vs-eager runtime indistinguishable under host noise (lazy
    19-128 s, eager 16-40 s interleaved in one JVM — the bimodality
    tracked external load, not the checkpoint lifecycle, see PERF.md
    round-6), so lazy wins on build-time semantics alone. Pin the
    eager=False call in the source AND the checkpoint scan in the plan
    (the plan cannot distinguish the two lifecycles)."""
    import inspect

    from bikes_data_warehouse_etl_spark.plans.pipeline_ops30 import (
        q_assoc_rules_topk,
    )

    src = inspect.getsource(q_assoc_rules_topk)
    assert "localCheckpoint(eager=False)" in src
    plan = _plan(spark, sf_dir, "assoc_rules_topk")
    assert "Scan ExistingRDD" in plan


def test_winnowing_is_row_local(spark, sf_dir):
    """Winnowing fingerprints are per-document array expressions behind
    ONE Generate boundary (round-6 rewrite): no doc-partitioned sort
    window, no distinct/groupBy hash exchange — the only permissible
    exchange is widen_scan's round-robin split-widener. The Generate
    boundary itself is load-bearing: without it ProjectCollapsing
    inlines the per-position md5 transform into every 4-window slice
    (O(n^2) per doc, measured 30x)."""
    plan = _plan(spark, sf_dir, "winnowing_fps")
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan
    assert "Generate explode" in plan
    # window minima must stay allocation-free least(element_at x4) —
    # array_min(slice(...)) allocates per position in the interpreted
    # HOF path (measured 4x the whole query at sf1)
    assert "least(" in plan and "array_distinct" in plan
    assert "slice(" not in plan


def test_theil_sen_distributed_median(spark, sf_dir):
    """The C(n,2) slope stage must stay row-local array expansion over
    the broadcast day series (no Window: the global row_number form
    funnels every slope into one task — 670M rows for a century of
    days; no sort-merge join: the day pair space must never shuffle),
    and the median machinery must perform only BOUNDED collects
    (histogram bisection: ≤1024-row histograms + ≤4096-row final walk
    — F.percentile's per-partition value maps grew with the distinct
    slope count)."""
    import pyspark.sql.functions as F

    from bikes_data_warehouse_etl_spark.plans.pipeline_ops35 import (
        _exact_rank_element,
    )
    from bikes_data_warehouse_etl_spark.plans.synthetic import QUERIES

    df = QUERIES["theil_sen_trend"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "SortMergeJoin" not in plan
    # result is a 1-row local relation: the heavy stages already ran
    # with bounded collects inside the query builder
    assert df.count() == 1 and len(df.columns) == 3

    # the bisection is exact on an adversarial multiset (dup-heavy,
    # negative values, rank at a duplicate boundary)
    vals = [-5] * 10 + [0] * 3 + [7] + [10_000_000] * 5
    sl = spark.createDataFrame([(v,) for v in vals], "s long")
    want = sorted(vals)
    for rank in (1, 10, 11, 13, 14, 19):
        assert _exact_rank_element(sl, rank) == want[rank - 1]


def test_dup_span_census_single_document_scan(spark, sf_dir):
    """The 8-gram duplication census must read documents EXACTLY once:
    the dup-set + join-back formulation evaluated the tokenize +
    span-explode scan once per consumer (measured 2x the runtime at
    every sf — PERF.md round 6). Four thin exchanges max: per-(doc,
    span) combine, span-frequency window, per-doc rollup, per-source
    rollup."""
    plan = _plan(spark, sf_dir, "dup_span_fraction")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") <= 4
