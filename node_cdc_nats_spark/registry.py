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


# Absolute head of round 4's verification order. Two groups, most-critical
# first: (a) every op that ERRed in CORRECTNESS_r03 — all victims of the
# events-loader fixture drift (fixed in io.py this round), seven of which
# have NEVER had a green row because r3 was their first verification slot;
# (b) ops whose definition changed in round 4 (ann_ivf_topk gained a
# deterministic fixed-centroid oracle; dedup_minhash/dedup_clusters gained
# the MINHASH_BUCKET_CAP, mirrored in their oracles), so their r3 greens
# verified old definitions.
_VERIFY_HEAD = (
    # (a) never-green: r3 was their first slot and the loader bug ate it
    "agg_quantiles", "agg_approx_quantiles", "channel_params", "join_asof",
    "map_ops", "scan_schema_evolution", "sink_compacted",
    # (a) r3-redefined, erred in r3 on the loader
    "nats_roundtrip", "stream_stream_left_join", "cdc_encode_decode",
    "except_distinct",
    # (a) erred in r3 on the loader
    "scan_partition_pruned",
    # (b) r4-redefined / r4-new
    "ann_ivf_topk", "dedup_minhash", "dedup_clusters",
    "dedup_embedding_cosine",  # r4: EMBED_BUCKET_CAP added (oracle-mirrored)
    "dedup_embedding_exact",  # r4: new — the cap's linear-pass counterpart
    "pipeline_end_to_end",  # r4: new — composed flagship (gate→dedup→decontam→split)
)


# r1/r2 greens that READ EVENTS: the r3 fixture drift falsified those rows
# (the loader failed analysis), so with the loader fixed they need a fresh
# green against the CURRENT fixture before their status is trustworthy.
_STALE_FIXTURE_GREEN = (
    "scan_stream", "sink_parquet", "sink_memory", "filter_channel",
    "rpc_first_response", "rpc_first_response_processed", "agg_avg",
    "agg_min_max", "win_lag_lead", "win_running", "union_all",
    "union_distinct", "intersect", "json_extract", "stream_watermark",
    "stream_tumble", "stream_slide", "stream_session", "stream_dedup",
    "stream_rpc_state", "stream_bounded_subscription", "stream_upsert",
    "stream_stream_join", "cdc_upsert_latest", "cdc_changelog", "cdc_scd2",
    "fanout_dispatch", "bounded_subscription",
)


# Greens whose inputs never drifted, oldest evidence first — re-verified
# only when budget reaches them. r1/r2 rows here verified non-events ops on
# fixtures identical to today's; r3 rows are the freshest and go last.
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
    "udtf_tokens", "scan_parquet", "scan_csv",
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


def load_all() -> None:
    """Import every operator module so registrations run, then order the
    registry for the driver's budgeted walk (50 verification slots per
    round, head first): r3 errs + r4-redefined ops, then the
    events-touching greens the fixture drift falsified, then anything
    without a listed status, then proven greens oldest-evidence-first."""
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
        functions_pack,
        pipeline,
        relational,
        window,
    )
    blocks = (
        _VERIFY_HEAD,
        _STALE_FIXTURE_GREEN,
        tuple(QUERIES),  # anything unlisted, in registration order
        _R1_GREEN_SAFE,
        _R2_GREEN_SAFE,
        _R3_GREEN,
    )
    listed = set(_VERIFY_HEAD) | set(_STALE_FIXTURE_GREEN) | set(
        _R1_GREEN_SAFE
    ) | set(_R2_GREEN_SAFE) | set(_R3_GREEN)
    ordered: list[str] = []
    for block in blocks:
        for n in block:
            if n in QUERIES and n not in ordered:
                if block is blocks[2] and n in listed:
                    continue
                ordered.append(n)
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
