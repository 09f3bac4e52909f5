"""Plan-shape assertions (SURVEY.md §5.2 item 5): the physical plans the
engine is designed around, checked explicitly so regressions that stay
value-correct but wreck the 100 TB story still fail CI.
"""

from __future__ import annotations

import re

import pytest

from node_cdc_nats_spark import registry

from .conftest import SF_DIR

registry.load_all()

# Streaming / side-effecting ops run real queries; plan checks here cover
# the pure-plan batch surface.
_SKIP = {
    "stream_tumble", "stream_slide", "stream_session", "stream_watermark",
    "stream_dedup", "stream_rpc_state", "nats_roundtrip", "scan_stream",
    "sink_parquet", "sink_memory", "stream_upsert", "stream_bounded_subscription",
    "stream_stream_join", "stream_stream_left_join", "stream_scd2",
    "stream_cdc_column_diff", "stream_join_asof_nearest",
    "stream_downsample_ohlc", "stream_topk", "stream_dedup_incremental",
}


def _plan(spark, name: str) -> str:
    df = registry.QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown(spark):
    plan = _plan(spark, "scan_parquet")
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double>" in plan


def test_q1_partial_aggregation(spark):
    # Pricing summary must partial-aggregate map-side: two HashAggregates
    # around one Exchange, never a raw shuffle of line items.
    plan = _plan(spark, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_fanout_is_map_side_only(spark):
    # The sub registry is tiny and driver-known; dispatch embeds it as
    # literal regexes and multicasts via explode — the plan must contain
    # no join and no shuffle of the 100 TB event side at all.
    plan = _plan(spark, "fanout_dispatch")
    assert "Join" not in plan
    assert "Exchange" not in plan.replace("ReusedExchange", "")


def test_dim_join_broadcasts_small_side(spark):
    plan = _plan(spark, "join_inner")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_sim_topk_broadcasts_queries(spark):
    plan = _plan(spark, "sim_topk")
    assert "BroadcastExchange" in plan


def test_no_cartesian_products(spark):
    # CartesianProduct = both sides shuffled into an all-pairs zip — never
    # acceptable in this engine; crossJoin uses include a broadcast side.
    offenders = []
    for name in sorted(registry.QUERIES):
        if name in _SKIP:
            continue
        if "CartesianProduct" in _plan(spark, name):
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_filters_reach_parquet_scans(spark):
    # Every batch op whose plan carries a parquet scan + filter should show
    # at least one pushed filter where the operator filters source columns.
    for name in ("filter_channel", "filter_predicate", "join_semi"):
        plan = _plan(spark, name)
        assert "PushedFilters: [" in plan, name


def test_q5_broadcasts_dimensions_and_prunes(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    # The bounded dimensions (supplier/nation/region) broadcast; the fact
    # sides (lineitem, orders, customer) are NOT pinned — AQE sizes those.
    assert plan.count("BroadcastHashJoin") >= 2
    # Column pruning: the lineitem scan reads only the join/measure columns.
    assert "ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint,l_extendedprice:double,l_discount:double>" in plan


def test_q5_no_pin_on_sf_proportional_sides(spark):
    # Only the fixed-cardinality dimensions (nation 25, region 5) carry
    # broadcast pins; customer/supplier/orders/lineitem all scale with SF
    # and must be hint-free so the 100×-safety is the planner's choice
    # (r5 verdict: a pinned supplier broadcast OOMs at the 100 TB target).
    df = registry.QUERIES["q5_local_supplier_volume"](spark, SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("strategy=broadcast") == 2


def test_join_range_broadcast_is_planner_choice(spark):
    # part is SF-proportional → NO pinned hint anywhere in the plan; the
    # size-based planner/AQE still broadcasts it at fixture scale.
    df = registry.QUERIES["join_range"](spark, SF_DIR)
    qe = df._jdf.queryExecution()
    assert "strategy=broadcast" not in qe.optimizedPlan().toString()
    assert "BroadcastHashJoin" in qe.executedPlan().toString()


def test_embedding_cosine_kept_buckets_not_pinned(spark):
    # The valid-bucket list grows ~n/2 with the corpus; it joins in as an
    # unpinned LeftSemi (AQE broadcasts at fixture scale), never a forced
    # broadcast (r5 verdict item 5).
    df = registry.QUERIES["dedup_embedding_cosine"](spark, SF_DIR)
    qe = df._jdf.queryExecution()
    opt = qe.optimizedPlan().toString()
    assert "strategy=broadcast" not in opt
    assert "LeftSemi" in qe.executedPlan().toString()


def test_q3_pushes_filters_no_forced_fact_broadcast(spark):
    # q3's plan must push both dimension-side date/segment filters into the
    # scans; join strategy for the orders⋈customer result is left to AQE
    # (no broadcast hint on a side that scales with SF).
    plan = _plan(spark, "q3_shipping_priority")
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert plan.count("HashAggregate") >= 2  # partial agg before top-k


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q18_large_volume"])
def test_fact_broadcast_flips_to_shuffle_at_scale(spark, name):
    # VERDICT r8 item 5: at fixture scale the planner legitimately
    # broadcasts the FILTERED fact side of q3/q18 (it fits under the
    # threshold). The 100×-scale guarantee is that this is a SIZE-BASED
    # choice, not a pin — shrink the broadcast threshold (the same effect
    # a 100× size estimate has against the default threshold) and the
    # fact join must revert to a shuffle join. AQE may still re-broadcast
    # at RUNTIME from actual sizes — that is correct adaptive behavior;
    # the static plan is what proves no hint forces the broadcast.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
    try:
        plan = _plan(spark, name)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
        f"{name}: no shuffle join under a 1KB broadcast threshold — "
        "a broadcast must be pinned somewhere on an SF-proportional side"
    )
    assert "BroadcastExchange" not in plan, (
        f"{name}: a broadcast survives a 1KB threshold — only an explicit "
        "hint can do that, and no SF-proportional side may carry one"
    )


def test_q1_scan_prunes_columns(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "l_partkey" not in plan.split("ReadSchema:")[-1]


def test_partitioned_scan_prunes_directories(spark):
    plan = _plan(spark, "scan_partition_pruned")
    assert "PartitionFilters: [" in plan
    assert "isnotnull(event_date" in plan


def test_bucketed_join_has_no_shuffle(spark):
    plan = _plan(spark, "join_bucketed")
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_split_and_sample_are_map_side(spark):
    # Deterministic split/sampling must stay scan+project/filter only —
    # at 100 TB any Exchange here would shuffle the whole corpus for
    # what is a per-row hash decision.
    for name in ("train_val_split", "sample_stratified"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"


def test_bm25_zero_corpus_shuffle_and_topk(spark):
    # BM25's only exchanges may serve the 1-row corpus-constant aggregate
    # (SinglePartition) and its broadcast back — the corpus itself must
    # never hash-shuffle (per-doc tf/dl are HOF projections, no explode),
    # and the top-k must be TakeOrderedAndProject, not a global sort.
    plan = _plan(spark, "bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan or "Exchange SinglePartition" in plan
    assert "Generate explode" not in plan


def test_topk_ngrams_partial_agg_and_topk(spark):
    # explode -> partial+final hash agg around one gram-key exchange,
    # and TakeOrderedAndProject (never a global Sort) for the top-k.
    plan = _plan(spark, "topk_ngrams")
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan


def test_decontaminate_broadcasts_benchmark_grams(spark):
    # The benchmark gram set is the small side; the training corpus must
    # never shuffle for the containment join.
    plan = _plan(spark, "decontaminate_ngram")
    assert "BroadcastHashJoin" in plan


def test_sample_temperature_broadcasts_census(spark):
    # The language census joins back to the corpus as a broadcast; the
    # corpus side must never shuffle for what is a per-row keep decision.
    plan = _plan(spark, "sample_temperature")
    assert "BroadcastHashJoin" in plan
    # the only exchanges allowed are for the tiny census aggregation,
    # never a hashpartitioning of the documents relation by doc columns
    assert "Exchange hashpartitioning(doc_id" not in plan


def test_doc_rarity_partial_aggs(spark):
    # Token counting and the per-doc mean must both partial-aggregate
    # map-side (two HashAggregates around each exchange).
    plan = _plan(spark, "doc_rarity_score")
    assert plan.count("HashAggregate") >= 4
    assert "Exchange hashpartitioning(token" in plan


def test_corpus_shuffle_single_shard_exchange(spark):
    # The training-order manifest must be ONE narrow shuffle on the shard
    # key and a per-shard window — never a global sort (no rangepartitioning)
    # and never a shuffle of the full document payload.
    plan = _plan(spark, "corpus_shuffle")
    assert plan.count("Exchange hashpartitioning(shard") == 1
    assert "rangepartitioning" not in plan
    # column pruning: only the key reaches the scan
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_pack_sequences_single_shard_exchange(spark):
    # Same shape: token counts computed map-side BEFORE the one shard
    # exchange; the running sum is a per-shard window, no global order.
    plan = _plan(spark, "pack_sequences")
    assert plan.count("Exchange hashpartitioning(shard") == 1
    assert "rangepartitioning" not in plan
    # n_toks is projected below the exchange (map-side), not above it
    below_exchange = plan.split("Exchange hashpartitioning(shard", 1)[1]
    assert "size(filter(split" in below_exchange


def test_corpus_mix_report_broadcasts_totals(spark):
    # Shares divide by a single-row total — broadcast, not a shuffle of
    # the grouped result against it.
    plan = _plan(spark, "corpus_mix_report")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ann_ivf_assignment_is_map_side(spark):
    # Fixed-centroid IVF: cell assignment is an array_min over literal-
    # centroid fold structs — a projection on the scan, never an n×K
    # shuffle/window; the probe list and query side join in as broadcasts.
    plan = _plan(spark, "ann_ivf_topk")
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan
    # the only hash exchange allowed is the final per-query top-k window
    assert plan.count("Exchange hashpartitioning") <= 1


def test_minhash_bands_bucket_join_not_self_join(spark):
    # Candidate generation must be ONE band/bucket aggregation feeding an
    # in-bucket pair generator — never a self-join that evaluates the
    # signature pipeline twice, and the signature UDF runs exactly once
    # per side thanks to the persisted signature table.
    plan = _plan(spark, "dedup_minhash")
    assert "Exchange hashpartitioning(band" in plan
    assert "InMemoryTableScan" in plan  # persisted signature table reused


def test_bounded_subscription_single_window_exchange(spark):
    # Dispatch is map-side (literal regexes); the only shuffle is the
    # per-sub delivery-counter window.
    plan = _plan(spark, "bounded_subscription")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(sub_id") == 1


def test_embedding_dedup_bucket_join_shape(spark):
    # Single-band (fixture) plan: the kept-bucket filter rides a broadcast
    # (tiny distinct-bucket set), candidates join on bucket equality —
    # never a cartesian — and the banded OR-construction keeps the same
    # shape per band with a Union on top.
    plan = _plan(spark, "dedup_embedding_cosine")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan

    from node_cdc_nats_spark.operators.similarity import dedup_embedding_cosine

    banded = dedup_embedding_cosine(spark, SF_DIR, n_bands=2)
    bplan = banded._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in bplan
    assert "Union" in bplan


def test_q6_is_pushdown_plus_global_agg(spark):
    # Q6 is the pure pushdown benchmark: all four predicates reach the
    # parquet scan, the scan reads exactly 4 columns, and the whole query
    # is one partial+final agg with a single-row exchange — no join, no
    # wide shuffle anywhere.
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)" in plan
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp_ntz>" in plan
    )
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "Exchange SinglePartition" in plan


def test_q14_month_filter_pushes_below_join(spark):
    # The one-month shipdate filter must reach the lineitem scan (join
    # input is ~1/84th of the fact table); part carries no broadcast pin
    # but AQE broadcasts it at fixture scale.
    plan = _plan(spark, "q14_promo_effect")
    assert "GreaterThanOrEqual(l_shipdate,1996-09-01" in plan
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_q18_having_semi_join_shape(spark):
    # The groupBy-HAVING qualifier feeds a LeftSemi back into the 3-way
    # join, and the top-100 is a TakeOrderedAndProject (never a global
    # sort of the joined fact table).
    plan = _plan(spark, "q18_large_volume")
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_q9_broadcasts_bounded_nation_only(spark):
    # nation (25 rows, bounded by construction) is pinned broadcast; the
    # agg is partial+final over a 25-nation × 7-year key space.
    plan = _plan(spark, "q9_nation_revenue")
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_q4_semi_join_with_residual(spark):
    # The EXISTS compiles to ONE LeftSemi with the non-equi lateness
    # predicate as a join residual — not an inner join + distinct, and
    # the 3-month window reaches the orders scan.
    plan = _plan(spark, "q4_order_priority")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate,1996-07-01" in plan
    assert plan.count("HashAggregate") >= 2


def test_q7_broadcasts_both_nation_roles(spark):
    # nation joins twice (supplier role, customer role); both are bounded
    # 25-row sides and must broadcast. The shipdate window reaches the
    # fact scan so the 4 SF-proportional joins see 2 years, not 7.
    plan = _plan(spark, "q7_volume_shipping")
    assert plan.count("BroadcastExchange") >= 2
    assert "GreaterThanOrEqual(l_shipdate,1996-01-01" in plan
    assert "CartesianProduct" not in plan


def test_q8_pushes_selective_filters_to_scans(spark):
    # The three selective predicates (p_type, o_orderdate window, r_name
    # via the pre-joined key list) all prune BEFORE the fact joins.
    plan = _plan(spark, "q8_market_share")
    assert "EqualTo(p_type,ECONOMY)" in plan
    assert "GreaterThanOrEqual(o_orderdate,1996-01-01" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_q13_outer_join_keeps_condition_filter(spark):
    # The priority predicate prunes the ORDERS side before the outer join
    # (pushed to its scan); customers with no qualifying orders survive.
    plan = _plan(spark, "q13_customer_distribution")
    assert "LeftOuter" in plan or "RightOuter" in plan
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan
    assert plan.count("HashAggregate") >= 4  # two partial+final agg pairs


def test_q15_max_is_broadcast_not_window(spark):
    # The global max joins back as a 1-row broadcast — never a Window
    # over an empty partitioning (single-task bottleneck at scale).
    plan = _plan(spark, "q15_top_supplier")
    assert "BroadcastExchange" in plan
    assert "Window" not in plan


def test_q17_threshold_agg_is_semi_restricted(spark):
    # The decorrelated per-part average is computed over the semi-join
    # restriction of lineitem (1 brand ≈ 1/25 of the fact), not all of it.
    plan = _plan(spark, "q17_small_quantity")
    assert "LeftSemi" in plan
    assert plan.count("HashAggregate") >= 4  # threshold agg + final agg


def test_q19_envelope_conjuncts_reach_scans(spark):
    # The cross-table disjunction cannot push, but its per-table envelopes
    # must: quantity band on lineitem, size band + brand IN on part.
    plan = _plan(spark, "q19_disjunctive_revenue")
    assert "GreaterThanOrEqual(l_quantity,1" in plan
    # (the printed PushedFilters list truncates; the size lower bound and
    # brand IN-list land before the cut)
    assert "GreaterThanOrEqual(p_size,1)" in plan
    assert "In(p_brand, [Brand#1,Brand#2,Brand#3])" in plan


def test_q21_single_fact_shuffle_not_self_joins(spark):
    # The EXISTS/NOT-EXISTS pair is folded into one per-order aggregate:
    # exactly one scan of lineitem (no l2/l3 self-join re-scans; the
    # orders join may reuse its exchange) and no semi/anti joins.
    plan = _plan(spark, "q21_waiting_supplier")
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("HashAggregate") >= 2
    # Two-level agg, not countDistinct: no Expand row-multiply.
    assert "Expand" not in plan


def test_q22_anti_join_and_scalar_broadcast(spark):
    # Dormancy = LeftAnti against recent orders; the average balance is a
    # 1-row broadcast (allowlisted nested-loop), and the recent-orders
    # date filter reaches the orders scan.
    plan = _plan(spark, "q22_sales_opportunity")
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate,1999-01-01" in plan
    assert "BroadcastExchange" in plan


def test_q2_window_min_single_partkey_exchange(spark):
    # The correlated MIN-subquery is decorrelated to ONE window over
    # p_partkey (no second join tree: the fact scans once); the size
    # filter reaches the part scan AND semi-joins below the pair
    # aggregate; bounded nation/region are broadcast.
    plan = _plan(spark, "q2_min_cost_supplier")
    assert "Window" in plan
    assert plan.count("lineitem.parquet") == 1  # no re-scan for the min
    assert "LeftSemi" in plan  # size restriction below the pair agg
    assert "EqualTo(p_size,15)" in plan
    assert "BroadcastExchange" in plan


def test_q11_threshold_is_scalar_broadcast(spark):
    # The fraction-of-total HAVING is a 1-row broadcast, and the nation
    # restriction reaches the nation scan before the broadcast join.
    plan = _plan(spark, "q11_important_stock")
    assert "EqualTo(n_name,NATION_3)" in plan
    assert "BroadcastExchange" in plan


def test_q12_date_window_reaches_fact_scan(spark):
    # The one-year window pushes into the lineitem scan; the late-shipment
    # comparison is a residual on the join, not a scan filter.
    plan = _plan(spark, "q12_late_priority")
    # (the printed PushedFilters list truncates; assert on the scan's
    # DataFilters, which carry the same pushed predicates)
    assert re.search(
        r"DataFilters: \[isnotnull\(l_shipdate#\d+\), \(l_shipdate#\d+ >= 1997-01-01",
        plan,
    )
    assert re.search(r"\(l_shipdate#\d+ < 1998-01-01", plan)


def test_q16_anti_join_no_expand(spark):
    # Complaint suppliers leave via LeftAnti; COUNT(DISTINCT) is the
    # two-level dedup-then-count, so no Expand row-multiply; the size
    # IN-list and brand/type exclusions reach the part scan.
    plan = _plan(spark, "q16_supplier_count")
    assert "LeftAnti" in plan
    assert "Expand" not in plan
    # (the printed PushedFilters list truncates before the size IN-list;
    # the brand/type exclusions land before the cut)
    assert "Not(EqualTo(p_type,PROMO))" in plan


def test_sessionize_single_user_exchange(spark):
    # Sessionization is ONE user_id shuffle end-to-end: the lag window,
    # the running-sum window, and the per-session aggregate all reuse the
    # same hash partitioning (grouping on (user_id, session_id) is
    # satisfied by clustering on user_id alone).
    plan = _plan(spark, "sessionize_events")
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(user_id" in plan


def test_funnel_one_window_pass(spark):
    # Both running first-stage minima share the window spec, so the only
    # exchanges are the user_id shuffle and the 1-row final census.
    plan = _plan(spark, "funnel_conversion")
    assert plan.count("Exchange") == 2
    assert "SinglePartition" in plan


def test_retention_no_expand(spark):
    # COUNT(DISTINCT user) is the two-level dedup-then-count; the dedup
    # reuses the window's user_id partitioning (no extra exchange for it).
    plan = _plan(spark, "retention_cohorts")
    assert "Expand" not in plan
    assert plan.count("Exchange") == 3  # window, final count, output sort


def test_q20_fused_pair_agg_single_fact_scan(spark):
    # availqty and qty1996 fuse into ONE groupBy over ONE lineitem scan
    # (not one pass per aggregate); the name prefix pushes as StartsWith;
    # the supplier restriction is a semi-join with nation broadcast.
    plan = _plan(spark, "q20_excess_stock")
    assert plan.count("lineitem.parquet") == 1
    assert "StringStartsWith(p_name,small)" in plan
    assert "LeftSemi" in plan
    assert "BroadcastExchange" in plan


# Queries whose plan legitimately contains a broadcast nested-loop/cartesian
# over a PROVABLY tiny side: join_cross (the cross-join demo itself,
# region×nation = 125 rows by construction), the two 1-row global-total
# joins in pipeline.py (sample_temperature's language census,
# corpus_mix_report's corpus totals), embed_knn's broadcast of the 5-row
# query set, and join_theta/join_range (non-equi conditions compile to
# BroadcastNestedLoopJoin over a broadcast dimension side by design).
_CARTESIAN_OK = {
    "join_cross", "join_theta", "join_range",
    "sample_temperature", "corpus_mix_report", "embed_knn", "sim_topk",
    # 1-row uncorrelated scalar subquery broadcast (the Q22 avg-balance,
    # the Q11 fraction-of-total threshold)
    "q22_sales_opportunity",
    "q11_important_stock",
    # 1-row corpus-total broadcast (surprisal normalizer)
    "perplexity_bucket",
    # 1-row n_docs broadcast (IDF normalizer)
    "tfidf_topk_terms",
    # 1-row (N, df, avgdl) corpus-constant broadcast (BM25 normalizers)
    "bm25_topk",
    # calendar-bounded day grid (non-equi trailing-window join; the grid
    # grows with TIME, not data volume — a decade is ~3.7k rows)
    "rolling_active_users",
    # 1-row Bloom-bitmap scalar broadcast
    "dedup_bloom_prefilter",
    # catalog-sized source-pair grid (|sources|² theta join; the corpus
    # self-join stays hash-keyed — pinned by its dedicated plan test)
    "source_overlap_matrix",
    # 1-row corpus-token-total scalar broadcast (the lift normalizer)
    "collocation_lift_topk",
    # 1-row order-total scalar broadcast (the basket-lift normalizer)
    "orders_market_basket",
    # calendar-bounded types×hours grid (both sides tiny; hours grow with
    # TIME, not data volume)
    "events_hourly_cusum",
    # composes sim_topk's bounded-probe cross join (5 probes × corpus —
    # the exact-truth side of the recall audit, probe-budget bounded)
    "embed_recall_at_k",
    # bounded query-side broadcast (5 queries × their 8×16 ADC lookup
    # tables) crossed against the code table — the PQ scan shape
    "ann_pq_topk",
    # 1-row horizon timestamp broadcast (the churn cutoff scalar)
    "events_inactivity_churn",
    # 1-row token-totals scalar broadcast (the DSIR normalizer)
    "dsir_importance_weights",
    # composes dsir_importance_weights (same 1-row totals broadcast)
    "curation_funnel",
}


@pytest.mark.parametrize(
    "name",
    [n for n in registry.QUERIES if n not in _SKIP],
)
def test_no_unexpected_cartesian_or_rowpython(spark, name):
    """Blanket 100 TB safety net over EVERY batch query's physical plan:
    no CartesianProduct and no nested-loop join outside the allowlisted
    tiny-broadcast sites, and no row-at-a-time Python eval anywhere
    (BatchEvalPython = per-row UDF; all Python must be ArrowEvalPython,
    FlatMapGroupsInPandas, or MapInPandas)."""
    plan = _plan(spark, name)
    if name not in _CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_perplexity_bucket_no_global_sort(spark):
    # Tercile assignment must be a broadcast of the per-lang cutoffs plus a
    # map-side CASE — never NTILE's per-lang global sort (no
    # rangepartitioning, no Window over the full corpus) — and the token
    # count must partial-aggregate before its exchange.
    plan = _plan(spark, "perplexity_bucket")
    assert "rangepartitioning" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("HashAggregate") >= 4


def test_decontaminate_containment_broadcasts_benchmark(spark):
    # Both benchmark-side joins (gram match + size lookup) must broadcast;
    # the corpus may never shuffle on gram.
    plan = _plan(spark, "decontaminate_containment")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Exchange hashpartitioning(gram" not in plan


def test_bpe_pair_stats_vocab_sized_pair_stage(spark):
    # Corpus-sized work ends at the token aggregation: pair explosion and
    # pair counting run over the vocabulary, top-50 via
    # TakeOrderedAndProject — never a global sort of pair counts.
    plan = _plan(spark, "bpe_pair_stats")
    assert plan.count("HashAggregate") >= 4  # partial+final for both aggs
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_unpivot_is_map_side_with_pushdown(spark):
    # The reshape must be one scan with the filter pushed below the
    # unpivot — no join, no shuffle of any kind.
    plan = _plan(spark, "unpivot_melt")
    assert "Join" not in plan
    assert "Exchange" not in plan.replace("ReusedExchange", "")
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45" in plan


def test_win_range_frame_single_shuffle(spark):
    # One exchange on the partition key; RANGE frame evaluated per
    # partition with no extra sort beyond the window's own.
    plan = _plan(spark, "win_range_frame")
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "rangepartitioning" not in plan


def test_downsample_ohlc_single_exchange(spark):
    # The window partitions by (event_type, bucket) and the final agg
    # groups by the same keys: Catalyst must reuse the window's
    # hashpartitioning — exactly one exchange, no global sort.
    plan = _plan(spark, "downsample_ohlc")
    assert plan.count("Exchange hashpartitioning(event_type") == 1
    assert "rangepartitioning" not in plan


def test_layout_zorder_prunes_2d_box_queries(spark, tmp_path):
    """Measured evidence for layout_zorder's claim: range-writing by the
    Morton value clusters BOTH key dimensions, so parquet row-group
    min/max stats exclude most groups for a small 2-D box predicate,
    while a single-column (natural) sort leaves the second dimension
    unclustered and nearly every group overlapping. At sf0.01 with 16 KB
    row groups the measured overlap is ~17% z-ordered vs ~97% natural —
    the scan-reduction this layout buys a 100 TB fact table."""
    import os

    import pyarrow.parquet as pq

    df = registry.QUERIES["layout_zorder"](spark, "/root/testdata/sf0.01")
    zdir, ndir = str(tmp_path / "z"), str(tmp_path / "n")
    (
        df.repartitionByRange(4, "zval").sortWithinPartitions("zval")
        .write.option("parquet.block.size", 16 * 1024).parquet(zdir)
    )
    (
        df.repartitionByRange(4, "l_orderkey").sortWithinPartitions("l_orderkey")
        .write.option("parquet.block.size", 16 * 1024).parquet(ndir)
    )

    def overlap_frac(path: str) -> float:
        tot = hit = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                pk = g.column(names["l_partkey"]).statistics
                sk = g.column(names["l_suppkey"]).statistics
                tot += 1
                # query box: partkey%256 and suppkey%256 both in [10, 40] —
                # but stats are on the RAW keys; the fixture's key ranges
                # are small enough that raw-key boxes behave the same.
                if pk.min <= 40 and pk.max >= 10 and sk.min <= 40 and sk.max >= 10:
                    hit += 1
        assert tot >= 8, "row groups too coarse for the comparison"
        return hit / tot

    z, n = overlap_frac(zdir), overlap_frac(ndir)
    assert z <= 0.5, f"z-order should exclude most row groups, overlapped {z:.0%}"
    assert n >= 0.7, f"sanity: natural order should overlap most groups, got {n:.0%}"
    assert z < n / 2, f"z-order must at least halve touched groups ({z:.0%} vs {n:.0%})"


def test_transition_matrix_one_wide_shuffle(spark):
    # The lag window shuffles on user_id once; the census aggregate that
    # follows exchanges only the tiny |types|^2 pair table.
    plan = _plan(spark, "events_transition_matrix")
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") <= 3  # window + census + p_next
    assert "ReadSchema: struct<event_id:bigint,ts:timestamp_ntz,user_id:bigint,event_type:string>" in plan


def test_rolling_active_users_broadcasts_grid(spark):
    # The day grid is the broadcast side of the trailing-window theta
    # join; the user-day pairs must NOT be the build side.
    plan = _plan(spark, "rolling_active_users")
    assert "BroadcastNestedLoopJoin BuildRight" in plan
    assert "Expand" not in plan  # distinct-then-count, not COUNT(DISTINCT)


def test_agg_histogram_partial_agg_and_pruned_scan(spark):
    plan = _plan(spark, "agg_histogram")
    assert plan.count("HashAggregate") >= 2  # partial map-side + final
    assert "ReadSchema: struct<l_extendedprice:double>" in plan


def test_bloom_prefilter_scan_and_broadcasts(spark):
    # The bitmap rides a broadcast; the exact-verify join hashes on
    # content_hash; the documents scan reads only (doc_id, text).
    # r7: the bitmap is BUILT by an aggregate (collect_set of positions
    # folds map-side into one sorted array, the bitmap rendered by a
    # row-local expression) — it must appear in the plan as an
    # aggregate, not arrive as a driver-computed literal (LocalTableScan
    # under the broadcast was the r6 collect-and-loop signature).
    plan = _plan(spark, "dedup_bloom_prefilter")
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "BroadcastExchange" in plan
    assert "collect_set" in plan
    assert "LocalTableScan" not in plan


def test_source_dup_rate_two_level_agg(spark):
    plan = _plan(spark, "source_dup_rate")
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 3  # partial+final hash level, final source level
    assert "ReadSchema: struct<text:string,source:string>" in plan or \
           "ReadSchema: struct<source:string,text:string>" in plan


def test_novelty_curve_exchange_reuse_no_expand(spark):
    # (gram, batch) dedup and the gram-keyed MIN are both gram-hash
    # layouts; the censuses are 16-row. No Expand, no nested loop.
    plan = _plan(spark, "ngram_novelty_curve")
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 4  # dedup + MIN + two censuses, partial/final


def test_source_overlap_self_join_is_hash_keyed(spark):
    # The corpus self-join must be an equi-join on the content hash
    # (per-key fan-out bounded by the source catalog). The ONLY
    # nested-loop join allowed is the catalog-sized pair grid (two
    # |sources|-row aggregates theta-joined on source_a < source_b);
    # never a nested loop over the corpus itself.
    plan = _plan(spark, "source_overlap_matrix")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # catalog pair grid only
    # The corpus self-join on md5(text) stays an equi hash/sort-merge join.
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        plan.count("BroadcastHashJoin") >= 1
    )
    assert "ReadSchema: struct<text:string,source:string>" in plan


def test_lang_confusion_census_no_corpus_join(spark):
    # Marker scoring is map-side; the only aggregation is the |langs|²
    # census, and the share window runs over that census — no Expand, no
    # corpus-sized join, scan pruned to (lang, text).
    plan = _plan(spark, "lang_confusion_matrix")
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final census
    assert "ReadSchema: struct<text:string,lang:string>" in plan or \
           "ReadSchema: struct<lang:string,text:string>" in plan


def test_seq_len_histogram_census_only(spark):
    # Bucket id and ceil-div are map-side integer projections; the whole
    # query is one ~20-group census plus a window over it — no join.
    plan = _plan(spark, "seq_len_histogram")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "ReadSchema: struct<text:string>" in plan


def test_collocation_topk_never_global_sorts(spark):
    # Top-50 must be TakeOrderedAndProject; the two unigram joins are
    # vocab-sized equi-joins; the only nested loop is the 1-row token
    # total broadcast. r7: the corpus is scanned ONCE — unigram and
    # bigram occurrences share one tagged explode + one exchange, and
    # every downstream consumer reads the persisted vocab-sized census
    # (InMemoryTableScan), never the corpus.
    # Hermetic cache state: other suite files run ops that persist
    # relations in the same JVM, and CacheManager substitution into a
    # pre-existing entry changes how the inlined cached plan prints
    # (the path-count arithmetic below assumes only THIS op's cache).
    spark.catalog.clearCache()
    plan = _plan(spark, "collocation_lift_topk")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row N broadcast
    # Census persisted and read by all four consumers (token total, the
    # two unigram joins, the bigram side) — the corpus explode runs once
    # and is never replayed. (executedPlan().toString() inlines the
    # SAME InMemoryRelation under each of its scans, so the parquet path
    # appears once per consumer; the relation itself computes once.)
    assert plan.count("InMemoryTableScan") >= 4
    # every corpus access goes through the cache — no raw corpus branch
    assert plan.count("documents.parquet") == plan.count("InMemoryRelation")


def test_embed_centroids_single_census_no_join(spark):
    # posexplode is a map-side Generate; the only exchange is the
    # (label, pos) census — |labels|·dim groups — with map-side partials.
    plan = _plan(spark, "embed_label_centroids")
    assert "Join" not in plan
    assert "Generate" in plan
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_latency_reuses_user_exchange(spark):
    # The running first-signup window and the per-user aggregate share
    # ONE user_id hash partitioning; after that only the cohort-week
    # census moves data.
    plan = _plan(spark, "funnel_latency_stats")
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "Window" in plan


def test_knn_purity_bucket_join_and_censuses(spark):
    # The self-join must be the bucket equi-join (ann_lsh_topk contract),
    # followed by the per-vector top-3 window and two integer censuses.
    plan = _plan(spark, "knn_label_purity")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    assert plan.count("HashAggregate") >= 4  # per-vec + per-label, partial/final


def test_hourly_cusum_census_then_grid(spark):
    # The corpus-sized stage is the (type, hour) census with map-side
    # partials; the dense grid join and the running-sum window act on
    # grid-sized input only. No Expand, no corpus-side nested loop beyond
    # the tiny types×hours grid.
    plan = _plan(spark, "events_hourly_cusum")
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 4  # census + per-type totals
    assert "Window" in plan
    assert "ReadSchema: struct<ts:timestamp" in plan


def test_market_basket_collects_baskets_and_topk(spark):
    # Baskets reduce via per-order collect_set (pairs then explode
    # map-side from the sorted array — no order-key self-join rescanning
    # lineitem per role); the only nested loop is the 1-row order total;
    # top-50 is TakeOrderedAndProject, never a global sort.
    plan = _plan(spark, "orders_market_basket")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "collect_set" in plan
    assert "SortMergeJoin" not in plan  # no corpus self-join anywhere
    assert "TakeOrderedAndProject" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>" in plan


def test_minhash_calibration_capped_buckets(spark):
    # Candidate generation must be the same capped banded-bucket pattern
    # as dedup_minhash: pairs explode from collect_list'ed bucket arrays,
    # never an uncapped signature self-join.
    plan = _plan(spark, "dedup_minhash_calibration")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "collect_list" in plan
    assert plan.count("HashAggregate") >= 2


def test_embed_drift_single_corpus_exchange(spark):
    # The only corpus-sized exchange is the (batch, pos) census; the
    # global census, pos join, and 16-row final agg are census-sized.
    plan = _plan(spark, "embed_drift_by_batch")
    assert "Join" in plan  # pos-keyed census join
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # map-side posexplode
    assert plan.count("HashAggregate") >= 4


def test_tfidf_single_tf_materialization(spark):
    # df must be a token-partitioned window over the ONE tf relation —
    # never a groupBy+join-back that re-executes the corpus explode for
    # the df side; n_docs comes from a plain documents count, so the
    # explode (Generate) appears exactly once in the plan.
    plan = _plan(spark, "tfidf_topk_terms")
    assert plan.count("Generate") == 1
    assert plan.count("Window") >= 2  # token df window + doc rank window


def test_cohort_ltv_one_customer_shuffle_no_expand(spark):
    # Cohort assignment is a partition-MIN window (one customer shuffle);
    # both censuses and the final join are (cohort, age)-sized; distinct
    # active customers use the two-level pattern, never Expand.
    plan = _plan(spark, "orders_cohort_ltv")
    assert "Expand" not in plan
    assert plan.count("Exchange hashpartitioning(o_custkey") == 1
    assert "Window" in plan
    assert plan.count("HashAggregate") >= 4


def test_user_concentration_census_collapse_no_global_user_sort(spark):
    # The Lorenz cumulative must run over the ACTIVITY-VALUE census, never
    # a global sort of per-user rows: exactly two hash exchanges (user_id
    # census, cnt census) feed the single-partition window, and the only
    # range partitioning is the final census-sized ORDER BY.
    plan = _plan(spark, "events_user_concentration")
    assert "Expand" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count("Exchange hashpartitioning(cnt") == 1
    assert "Window" in plan
    assert "NTILE" not in plan.upper()


def test_recall_audit_composes_exact_and_lsh_sides(spark):
    # The truth side is the bounded-probe cross join (5 probes broadcast),
    # the ANN side a bucket equi-join; the recall reduction downstream is
    # k-by-probes sized. No Python in the final plan beyond the signature
    # pandas_udf the ANN operator already carries.
    plan = _plan(spark, "embed_recall_at_k")
    assert "BroadcastNestedLoopJoin" in plan  # bounded probe cross join
    assert "BroadcastHashJoin" in plan  # LSH bucket equi-join (ann side)
    assert "BatchEvalPython" not in plan


def test_dsir_single_corpus_explode_broadcast_census(spark):
    # ONE corpus explode feeds the persisted (doc, bucket) pair table;
    # the 4096-row census (raw + target counts in one pass) broadcasts
    # into the scoring join; the 1-row totals ride the only nested loop.
    # No second corpus scan for the target slice, no Python anywhere.
    spark.catalog.clearCache()  # hermetic vs other tests' cache entries
    plan = _plan(spark, "dsir_importance_weights")
    assert plan.count("InMemoryTableScan") >= 2  # pair table reused
    assert "BroadcastHashJoin" in plan  # census join
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row totals
    assert "BatchEvalPython" not in plan
    assert "Expand" not in plan


def test_weekly_stickiness_one_corpus_exchange_no_expand(spark):
    # The (user_id, day) dedup is the ONLY corpus-sized exchange; the
    # week dedup re-keys user-day rows; both censuses count pre-deduped
    # rows (no COUNT(DISTINCT) Expand); the day x week census join is
    # calendar-sized.
    spark.catalog.clearCache()  # hermetic vs other tests' cache entries
    plan = _plan(spark, "events_weekly_stickiness")
    assert "Expand" not in plan
    # The (user_id, day) dedup feeds a persisted user-day table read by
    # both censuses — every corpus access goes through the cache (the
    # toString inlines the SAME InMemoryRelation under each consumer, so
    # the scan string appears once per consumer; the relation computes
    # once). The only other user_id exchange is the user-day-sized
    # (user_id, week) re-key.
    assert plan.count("InMemoryTableScan") >= 2
    assert plan.count("events.parquet") == plan.count("InMemoryRelation")
    assert "NTILE" not in plan.upper()


def test_asof_nearest_single_shuffle_both_directions(spark):
    # Backward and forward candidates ride the SAME tagged-union window
    # sort: one full-width user_id exchange plus the purchase-side
    # (user_id, ts) pre-reduce — and nothing else; no join of any kind,
    # and the direction pick is a projection.
    plan = _plan(spark, "join_asof_nearest")
    assert plan.count("Exchange hashpartitioning(user_id#") == 2
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_cdc_column_diff_shares_changelog_shape(spark):
    # One user_id window exchange carries all four LAGs; the diff is a
    # map-side projection — no joins, no aggregation pass.
    plan = _plan(spark, "cdc_column_diff")
    assert plan.count("Exchange hashpartitioning(user_id#") == 1
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_edit_distance_candidate_sized_no_python_rowwise(spark):
    # Identical candidate generation to dedup_minhash (one (band, mh)
    # exchange, capped buckets); the verify adds two doc-id joins and a
    # JVM-side levenshtein — no cartesian, no row-at-a-time Python (the
    # shingle signature stage is the Arrow pandas_udf the family shares).
    plan = _plan(spark, "dedup_edit_distance")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan  # shared shingle/signature udf
    assert "levenshtein" in plan


def test_session_paths_one_user_exchange_then_census(spark):
    # Session assignment, in-session truncation, and the ordered path
    # collect all ride ONE user_id exchange; the path census is hash-agg
    # partial+final; top-20 is TakeOrderedAndProject, never a global sort.
    plan = _plan(spark, "events_session_paths_topk")
    assert plan.count("Exchange hashpartitioning(user_id#") == 1
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
