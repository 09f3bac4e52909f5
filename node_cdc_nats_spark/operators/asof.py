"""As-of join — SURVEY.md §2.2 row "As-of / interval join".

The reference's RPC (first response *after* a request within a timeout) is
one as-of direction (`operators/cdc.py:rpc_first_response`); this is the
other, classic time-series direction: for each left event, the LATEST right
event at-or-before it per key.

Spark-first plan: no range join and no per-row subquery. Union the two
tagged streams, sort within one hash shuffle on the key, and propagate the
most recent right row with `last(..., ignorenulls=True)` over
(key, ts, side) ordering — right rows sort before coincident left rows, so
"at or before" includes exact ties. Cost: ONE shuffle of left+right, state
one row per partition-ordering position — at 100 TB this beats the
BroadcastNestedLoopJoin a naive `ON r.ts <= l.ts` theta join produces (and
equals what DuckDB's native ASOF JOIN does with a sort-merge).

Determinism: coincident right rows are pre-reduced to max event_id per
(key, ts) so both engines agree on which row "the latest" is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io import load_table
from ..registry import register


@register(
    "join_asof",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'),
    purch AS (  -- one row per (user, ts): max event_id wins coincident ties
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(event_id) AS p_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, CAST(ts AS TIMESTAMP))
    SELECT c.event_id, c.user_id, c.ts,
           p.p_id AS asof_purchase_id, p.ts AS asof_purchase_ts
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("p_id"),
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_id"))
        .select(
            F.lit(None).cast("long").alias("event_id"), "user_id", "ts",
            F.lit(0).alias("side"), "p_id",
        )
    )
    # side=0 (purchase) sorts before side=1 (click) at equal ts → inclusive.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tagged = clicks.unionByName(purch)
    return (
        tagged.withColumn("asof_purchase_id", F.last("p_id", ignorenulls=True).over(w))
        .withColumn(
            "asof_purchase_ts",
            F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True).over(w),
        )
        .filter(F.col("side") == 1)
        .select("event_id", "user_id", "ts", "asof_purchase_id", "asof_purchase_ts")
    )
