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


# Ops with a fully green row (rows+schema+hash) in CORRECTNESS_r01.json
# AND whose query/oracle output is unchanged since — the driver verifies in
# registration order and round 1's run stopped at exactly 50 entries, so
# these proven ops yield their early slots to the ops that still need a
# first green row. NOT listed despite r1 green, because round 2 changed
# their outputs (de-vacuating empty results): q5_local_supplier_volume,
# join_anti, except_distinct — their r1 rows verified the OLD definitions.
_R1_GREEN = (
    "agg_avg", "agg_count", "agg_cube", "agg_distinct", "agg_grouping_sets",
    "agg_min_max", "agg_multi", "agg_pivot", "agg_rollup", "agg_stats",
    "agg_sum", "bounded_subscription", "date_ops",
    "fanout_dispatch", "filter_channel", "filter_predicate", "intersect",
    "join_bucketed", "join_cross", "join_full", "join_inner",
    "join_left", "join_range", "join_right", "join_semi", "join_skew_salted",
    "join_theta", "json_extract", "json_schema_projection", "limit",
    "math_ops", "project", "q1_pricing_summary", "q3_shipping_priority",
    "sort", "str_ops", "topk", "topk_per_group",
    "union_all", "union_distinct", "win_frame_sliding", "win_lag_lead",
    "win_percent", "win_rank", "win_running",
)


# Ops with a fully green row in CORRECTNESS_r02.json whose query/oracle
# output is unchanged since — demoted to the late block so round 3's 50
# driver slots reach the ops that have never been verified (the whole
# pipeline.py module, join_asof, map_ops, scan_json, scan_schema_evolution,
# sink_compacted, agg_quantiles, q10, win_ntile, scan_partition_pruned).
# NOT listed despite r2 green, because round 3 changes their
# implementation: nats_roundtrip (partitioned JetStream-shaped reader),
# stream_stream_left_join (streaming-native finalization horizon) — both
# sit in _VERIFY_HEAD instead.
_R2_GREEN = (
    "array_ops", "cdc_encode_decode", "q5_local_supplier_volume",
    "join_anti", "except_distinct", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash", "dedup_simhash", "dedup_clusters", "sim_topk",
    "ann_lsh_topk", "embed_knn", "text_stats",
    "lang_id", "token_count", "quality_score", "doc_fingerprint",
    "text_normalize", "text_embed_hash", "multimodal_meta",
    "multimodal_frame_sample", "multimodal_features", "multimodal_resize",
    "udf_scalar", "udf_grouped", "udf_grouped_agg", "udtf_tokens",
    "cdc_upsert_latest", "cdc_changelog", "rpc_first_response",
    "rpc_first_response_processed", "cdc_scd2",
    "stream_bounded_subscription", "stream_stream_join", "stream_rpc_state",
    "stream_upsert", "stream_tumble", "stream_slide", "stream_session",
    "stream_watermark", "stream_dedup", "scan_parquet", "scan_stream",
    "sink_parquet", "sink_memory", "scan_csv",
)


# Absolute head of the verification order, most-critical first: ops whose
# implementation or output changes in round 3, so their prior green rows
# verified old definitions and they need a fresh verdict.
_VERIFY_HEAD = (
    "agg_approx_distinct",  # r3: redefined hash-checkable (error-gate cols)
    "agg_approx_quantiles",  # r3: redefined hash-checkable (error-gate cols)
    "nats_roundtrip",  # r3: executor-parallel partitioned reader
    "stream_stream_left_join",  # r3: streaming-native finalization horizon
    "dedup_embedding_cosine",  # r3: de-vacuated (threshold fires on fixture)
)
# Rows-only ops can never earn a hash-green row — they go right before the
# green blocks so hash-checkable ops never lose a budget slot to them.
_ROWS_ONLY_LATE = ("ann_ivf_topk",)


def load_all() -> None:
    """Import every operator module so registrations run, then order the
    registry for the driver's budgeted walk: _VERIFY_HEAD first, then all
    ops needing their first green row (registration order), then rows-only
    ops, then round-2- and round-1-green ops (re-verified only if budget
    reaches them)."""
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
    ordered = [n for n in _VERIFY_HEAD if n in QUERIES]
    late = set(_ROWS_ONLY_LATE) | set(_R1_GREEN) | set(_R2_GREEN)
    ordered += [n for n in QUERIES if n not in ordered and n not in late]
    ordered += [n for n in _ROWS_ONLY_LATE if n in QUERIES]
    ordered += [n for n in _R2_GREEN if n in QUERIES]
    ordered += [n for n in _R1_GREEN if n in QUERIES]
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
