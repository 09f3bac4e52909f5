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


# Absolute head of round 6's verification order: the three r5 CORRECTNESS
# hash-fails whose oracles were redefined this round (root cause: DuckDB
# SUM(int) → HUGEINT → pandas float64 vs Spark int64 under the driver's
# dtype-sensitive hash; fixed with CAST(... AS BIGINT)), plus every op
# whose code or oracle changed in r6, so the driver re-earns those greens
# against current definitions.
_VERIFY_HEAD = (
    # r6: the r5 hash-fails, oracle sums cast to BIGINT
    "q12_late_priority",
    "sessionize_events",
    "funnel_conversion",
    # r6: oracle redefined — zero-variance NULLIF/GREATEST guard (ADVICE)
    "agg_corr",
    # r6: impl changed — SF-proportional broadcast pins removed
    "join_range",
    "q5_local_supplier_volume",
    # r6: impl changed — kept-bucket list now an unhinted semi-join
    "dedup_embedding_cosine",
    # r6: impl changed — bucketed-table names digest the full sf_dir path
    "join_bucketed",
    # r6: impl changed — per-token surprisal hoisted to the vocab table
    "perplexity_bucket",
    # r6: new ops, first verification
    "events_anomaly_zscore",     # per-type 3-sigma outlier flags
    "tfidf_topk_terms",          # integer TF-IDF top-3 terms per doc
    "quality_classifier_linear", # fixed-weight linear quality gate
    "dedup_incremental",         # new-batch vs kept-corpus ingest dedup
    "doc_chunk_overlap",         # sliding-window chunking for embedding prep
    "layout_zorder",             # Morton-curve layout key for 2-D pruning
    "agg_weighted_avg",          # decimal-exact weighted mean
    "agg_string_agg",            # ordered LISTAGG (sorted-array join)
    "orders_rfm_segments",       # RFM tercile segmentation census
    "events_transition_matrix",  # Markov next-event census + row probs
    "rolling_active_users",      # trailing-7-day distinct actives per day
    "dedup_bloom_prefilter",     # broadcast-Bloom incremental-ingest screen
    "agg_histogram",             # fixed-width profiling histogram
    "source_dup_rate",           # per-source exact-dup telemetry
    "ngram_novelty_curve",       # per-ingest-batch trigram novelty decay
    "source_overlap_matrix",     # pairwise source content-overlap census
    "lang_confusion_matrix",     # metadata-vs-heuristic language agreement
    "seq_len_histogram",         # log2 token-length census + packing waste
    "collocation_lift_topk",     # libm-free PMI-family collocation mining
    "embed_label_centroids",     # order-independent per-label centroids
    "funnel_latency_stats",      # signup->purchase latency per week cohort
    "knn_label_purity",          # embedding label-coherence QA via LSH-kNN
    "events_hourly_cusum",       # CUSUM drift over dense hourly rate grid
    "orders_market_basket",      # part-pair lift mining over order baskets
    "dedup_minhash_calibration", # est-vs-true Jaccard audit on candidates
    "embed_drift_by_batch",      # per-ingest-batch centroid L1 drift
    "orders_cohort_ltv",         # acquisition-cohort LTV revenue triangle
    "events_user_concentration", # Lorenz activity-concentration census
    "embed_recall_at_k",         # ANN recall@k audit vs brute-force truth
)


# The budgeted walk (50 driver slots per round) then refreshes the OLDEST
# evidence first. After r5 the freshest rows are the r5 sample (its
# 41-op head + the first 9 r1-era aggregates); the oldest remaining
# evidence is r1 (23 ops), then r2 (9), then r3 (30). Round 6's 50 slots
# cover head 39 + unlisted 0 + the first 11 of r1; the r1 tail, r2, r3,
# and the r4/r5 blocks carry fresher evidence and wait for r7.
_R1_GREEN_SAFE = (
    "date_ops", "filter_predicate", "join_cross",
    "join_full", "join_inner", "join_left", "join_right",
    "join_semi", "join_skew_salted", "join_theta",
    "json_schema_projection", "limit", "math_ops", "project",
    "q1_pricing_summary", "q3_shipping_priority", "sort", "str_ops",
    "topk", "topk_per_group", "win_frame_sliding", "win_percent",
    "win_rank",
)
_R2_GREEN_SAFE = (
    "multimodal_meta", "multimodal_frame_sample", "multimodal_features",
    "multimodal_resize", "udf_scalar", "udf_grouped", "udf_grouped_agg",
    "scan_parquet", "scan_csv",
)
_R3_GREEN = (
    "agg_approx_distinct", "scan_json",
    "train_val_split", "sample_stratified", "quality_filter_gopher",
    "topk_ngrams", "decontaminate_ngram", "repetition_ratio", "pii_redact",
    "corpus_vocab_stats", "sample_temperature",
    "corpus_mix_report", "corpus_shuffle", "pack_sequences",
    "embed_norm_quantize", "q10_returned_items", "win_ntile", "array_ops",
    "join_anti", "dedup_exact",
    "dedup_ngram_jaccard", "sim_topk",
    "embed_knn", "text_stats", "lang_id", "token_count", "quality_score",
    "doc_fingerprint", "text_normalize", "text_embed_hash",
)
# r4 greens — second-freshest evidence.
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
# r5 greens (the r5 head that is NOT redefined in r6, plus the nine
# r1-era aggregates r5 refreshed) — freshest evidence, verified last.
_R5_GREEN = (
    "dedup_simhash", "ann_lsh_topk", "scan_orc", "dedup_embedding_banded",
    "doc_rarity_score", "udtf_tokens", "dedup_substring",
    "split_leakage_report", "q6_forecast_revenue", "q9_nation_revenue",
    "q14_promo_effect", "q18_large_volume", "q4_order_priority",
    "q7_volume_shipping", "q8_market_share", "q13_customer_distribution",
    "q15_top_supplier", "q17_small_quantity", "q19_disjunctive_revenue",
    "q21_waiting_supplier", "q22_sales_opportunity", "q2_min_cost_supplier",
    "q11_important_stock", "q16_supplier_count", "q20_excess_stock",
    "retention_cohorts", "decontaminate_containment",
    "bpe_pair_stats", "scan_binary", "stream_scd2", "win_range_frame",
    "unpivot_melt", "agg_mode", "downsample_ohlc", "dedup_span",
    "agg_count", "agg_cube", "agg_distinct", "agg_grouping_sets",
    "agg_multi", "agg_pivot", "agg_rollup", "agg_stats", "agg_sum",
)


def load_all() -> None:
    """Import every operator module so registrations run, then order the
    registry for the driver's budgeted walk (50 verification slots per
    round, head first): round-6-redefined ops, then any unlisted op, then
    proven greens oldest-evidence-first (r1 → r2 → r3 → r4 → r5)."""
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
        | set(_R5_GREEN)
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
        _R5_GREEN,
    )
    ordered: list[str] = []
    for block in blocks:
        for n in block:
            if n in QUERIES and n not in ordered:
                ordered.append(n)
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
