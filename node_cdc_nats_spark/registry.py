"""Query/oracle registry backing the driver contract in ``__spark_entry__.py``.

Every operator from SURVEY.md §2.2 registers here: a PySpark callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the equivalent
DuckDB oracle SQL. The driver compares row count + schema + order-insensitive
value hash, so every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL over the driver's
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings). Omit ``oracle`` for ops that are
    not SQL-expressible (driver then records a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Absolute head of round 5's verification order: ops whose DEFINITION
# changed in round 5, so their r3/r4 greens verified old code.
# dedup_embedding_cosine was restructured for adaptive signature width
# (similarity.n_planes_for + optional banding — the fixture-scale plan
# degenerates to the verified single-band/8-plane one, but the green must
# be re-earned); dedup_simhash and ann_lsh_topk gained empty-Arrow-batch
# guards inside their pandas_udfs (ADVICE r4).
_VERIFY_HEAD = (
    "dedup_embedding_cosine",
    "dedup_simhash",
    "ann_lsh_topk",
    "scan_orc",  # r5: new — ORC file-format reader, first verification
    "dedup_embedding_banded",  # r5: new — banded OR-construction, first verification
    # r5: doc_rarity_score redefined (unique-pair shuffle rewrite) — its r3
    # green verified the occurrence-shuffle definition
    "doc_rarity_score",
    # r5: udtf_tokens redeclared Arrow-optimized (useArrow=True)
    "udtf_tokens",
    # r5: new corpus ops — long-span verbatim-overlap pairs and the
    # cross-split contamination audit, first verification
    "dedup_substring",
    "split_leakage_report",
    # r5: new TPC-H-style flagships (operators/flagships.py), first verification
    "q6_forecast_revenue",
    "q9_nation_revenue",
    "q14_promo_effect",
    "q18_large_volume",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity",
    "q19_disjunctive_revenue",
    "q21_waiting_supplier",
    "q22_sales_opportunity",
    # r5: the last five TPC-H shapes (partsupp derived from lineitem
    # distinct pairs), first verification
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q12_late_priority",
    "q16_supplier_count",
    "q20_excess_stock",
    # r5: new event-analytics ops (operators/analytics.py), first verification
    "sessionize_events",
    "funnel_conversion",
    "retention_cohorts",
    # r5: new — CCNet-style surprisal tercile bucketing, first verification
    "perplexity_bucket",
    # r5: new — pairwise n-gram-containment decontamination report
    "decontaminate_containment",
    # r5: new — BPE first-merge pair ranking over the vocabulary
    "bpe_pair_stats",
    # r5: new — binaryFile multimodal-blob ingestion scan
    "scan_binary",
    # r5: new — streaming SCD2 interval maintenance (foreachBatch merge)
    "stream_scd2",
    # r5: new — RANGE-frame window and wide-to-long reshape
    "win_range_frame",
    "unpivot_melt",
    # r5: new — deterministic per-group mode and time-bucketed OHLC rollup
    "agg_mode",
    "downsample_ohlc",
    # r5: new — C4-style span-level dedup rewrite
    "dedup_span",
    # r5: new — engine-exact Pearson correlation / covariance
    "agg_corr",
)



# After r4 every one of the 124 r4-era queries carries a latest-status
# full pass (r4 itself went 50/50 over the errs, redefinitions, and
# drift-falsified greens). With nothing broken or stale, the budgeted walk
# puts any op with NO recorded status (unlisted anywhere — the safety net
# for a future op someone forgets to head-list) right after the head, then
# refreshes the OLDEST evidence first: r1 greens, then r2, then r3; r4
# rows are the freshest and go last (head 5 + unlisted 0 + r1 33 + r2 10
# + first 2 of r3 fill the 50 slots).
_R1_GREEN_SAFE = (
    "agg_count", "agg_cube", "agg_distinct", "agg_grouping_sets",
    "agg_multi", "agg_pivot", "agg_rollup", "agg_stats", "agg_sum",
    "date_ops", "filter_predicate", "join_bucketed", "join_cross",
    "join_full", "join_inner", "join_left", "join_range", "join_right",
    "join_semi", "join_skew_salted", "join_theta",
    "json_schema_projection", "limit", "math_ops", "project",
    "q1_pricing_summary", "q3_shipping_priority", "sort", "str_ops",
    "topk", "topk_per_group", "win_frame_sliding", "win_percent",
    "win_rank",
)
_R2_GREEN_SAFE = (
    "multimodal_meta", "multimodal_frame_sample", "multimodal_features",
    "multimodal_resize", "udf_scalar", "udf_grouped", "udf_grouped_agg",
    # udtf_tokens moved to _VERIFY_HEAD (r5 Arrow redeclaration)
    "scan_parquet", "scan_csv",
)
_R3_GREEN = (
    "agg_approx_distinct", "scan_json",
    "train_val_split", "sample_stratified", "quality_filter_gopher",
    "topk_ngrams", "decontaminate_ngram", "repetition_ratio", "pii_redact",
    "corpus_vocab_stats", "sample_temperature", "doc_rarity_score",
    "corpus_mix_report", "corpus_shuffle", "pack_sequences",
    "embed_norm_quantize", "q10_returned_items", "win_ntile", "array_ops",
    "q5_local_supplier_volume", "join_anti", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_simhash", "sim_topk", "ann_lsh_topk",
    "embed_knn", "text_stats", "lang_id", "token_count", "quality_score",
    "doc_fingerprint", "text_normalize", "text_embed_hash",
)
# r4 greens (the r3-err re-verifications and drift-falsified re-greens) —
# freshest evidence, verified only when budget reaches them.
_R4_GREEN = (
    "agg_quantiles", "agg_approx_quantiles", "channel_params", "join_asof",
    "map_ops", "scan_schema_evolution", "sink_compacted", "nats_roundtrip",
    "stream_stream_left_join", "cdc_encode_decode", "except_distinct",
    "scan_partition_pruned", "ann_ivf_topk", "dedup_minhash",
    "dedup_clusters", "dedup_embedding_exact", "pipeline_end_to_end",
    "scan_stream", "sink_parquet", "sink_memory", "filter_channel",
    "rpc_first_response", "rpc_first_response_processed", "agg_avg",
    "agg_min_max", "win_lag_lead", "win_running", "union_all",
    "union_distinct", "intersect", "json_extract", "stream_watermark",
    "stream_tumble", "stream_slide", "stream_session", "stream_dedup",
    "stream_rpc_state", "stream_bounded_subscription", "stream_upsert",
    "stream_stream_join", "cdc_upsert_latest", "cdc_changelog", "cdc_scd2",
    "fanout_dispatch", "bounded_subscription",
)


def load_all() -> None:
    """Import every operator module so registrations run, then order the
    registry for the driver's budgeted walk (50 verification slots per
    round, head first): round-5-redefined ops, then proven greens
    oldest-evidence-first (r1 → r2 → r3), then anything without a listed
    status (the freshest r4 greens) in registration order."""
    from .operators import (  # noqa: F401
        dedup,
        similarity,
        text,
        multimodal,
        udfs,
        sinks,
        asof,
        envelope,
        cdc,
    )
    from . import streaming  # noqa: F401
    from .operators import (  # noqa: F401
        analytics,
        flagships,
        functions_pack,
        pipeline,
        relational,
        window,
    )
    listed = (
        set(_VERIFY_HEAD)
        | set(_R1_GREEN_SAFE)
        | set(_R2_GREEN_SAFE)
        | set(_R3_GREEN)
        | set(_R4_GREEN)
    )
    blocks = (
        _VERIFY_HEAD,
        # Safety net: an op listed NOWHERE has no recorded status and must
        # be verified before any green re-verification burns its slot —
        # a future round that registers an op but forgets the head list
        # still gets it verified (and test_survey_inventory flags it).
        tuple(n for n in QUERIES if n not in listed),
        _R1_GREEN_SAFE,
        _R2_GREEN_SAFE,
        _R3_GREEN,
        _R4_GREEN,
    )
    ordered: list[str] = []
    for block in blocks:
        for n in block:
            if n in QUERIES and n not in ordered:
                ordered.append(n)
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
