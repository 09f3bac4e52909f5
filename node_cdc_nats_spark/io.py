"""Parquet loaders for the driver fixture tables.

The only non-trivial case is ``events``: its ``ts`` column is parquet
TIMESTAMP(NANOS), which Spark's vectorized reader rejects. We read nanos as
int64 (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild an event-time
column as TIMESTAMP_NTZ via pure integer arithmetic — integer ``div`` (not
float division, which rounds differently from the DuckDB oracle's
nanosecond truncation) and an epoch-anchored ``timestampadd`` so the result
is session-timezone-independent.

At cluster scale these loaders stay plan-level (no driver materialization):
the nanos conversion is a codegen'd projection on top of the parquet scan,
so pushdown/pruning still apply to every other column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import tune_session

# Nanosecond→microsecond truncation then anchor at the NTZ epoch: matches
# DuckDB's CAST(TIMESTAMP_NS AS TIMESTAMP) truncation semantics exactly.
_EVENTS_TS_EXPR = (
    "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes ``events.ts`` to TIMESTAMP_NTZ."""
    if name == "events":
        tune_session(spark)
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.expr(_EVENTS_TS_EXPR))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]
