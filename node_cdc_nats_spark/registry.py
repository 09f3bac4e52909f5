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


def load_all() -> None:
    """Import every operator module so registrations run, then order the
    registry: round-1-unverified and round-2 ops first (they need their
    first driver CORRECTNESS row), round-1-green ops last (re-verified
    only if the driver's budget reaches them)."""
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
    for name in _R1_GREEN:
        if name in QUERIES:
            QUERIES[name] = QUERIES.pop(name)  # move to the tail, keep order
