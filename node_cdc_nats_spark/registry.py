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
    """Import every operator module so registrations run."""
    from .operators import (  # noqa: F401
        relational,
        window,
        functions_pack,
        cdc,
        dedup,
        similarity,
        text,
        multimodal,
        envelope,
        udfs,
        sinks,
        asof,
    )
    from . import streaming  # noqa: F401
