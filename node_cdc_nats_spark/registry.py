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


def load_all() -> None:
    """Import every operator module so registrations run.

    Order is deliberate: the driver verifies queries in registration order
    and round 1's run cut off after 50 entries, leaving everything after
    ``operators/cdc.py`` unverified. The LLM-pipeline / UDF / sink / CDC /
    streaming surface (plus ``functions_pack``, which held round 1's one
    failing op) therefore registers FIRST — exactly 50 ops — and the 41
    relational/window ops that already went green in round 1 register last.
    """
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
