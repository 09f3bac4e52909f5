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


@register(
    "join_asof_nearest",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'),
    purch AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(event_id) AS p_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, CAST(ts AS TIMESTAMP)),
    tagged AS (
      SELECT event_id, user_id, ts, 1 AS side, NULL AS p_id FROM clicks
      UNION ALL
      SELECT NULL, user_id, ts, 0, p_id FROM purch),
    w AS (
      SELECT *,
        LAST_VALUE(p_id IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, side
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_id,
        LAST_VALUE(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, side
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_ts,
        FIRST_VALUE(p_id IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, side
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_id,
        FIRST_VALUE(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, side
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_ts
      FROM tagged),
    picked AS (
      SELECT event_id, user_id, ts,
             CASE WHEN back_id IS NOT NULL AND (fwd_id IS NULL
                    OR epoch_us(ts) - epoch_us(back_ts)
                       <= epoch_us(fwd_ts) - epoch_us(ts))
                  THEN 'backward'
                  WHEN fwd_id IS NOT NULL THEN 'forward'
                  ELSE NULL END AS direction,
             back_id, back_ts, fwd_id, fwd_ts
      FROM w WHERE side = 1)
    SELECT event_id, user_id, ts,
           CAST(CASE direction WHEN 'backward' THEN back_id
                WHEN 'forward' THEN fwd_id END AS BIGINT)
             AS nearest_purchase_id,
           CASE direction WHEN 'backward' THEN back_ts
                WHEN 'forward' THEN fwd_ts END AS nearest_purchase_ts,
           direction
    FROM picked
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest')`` / kdb ``aj`` family): for each left click, the purchase
    by the SAME user closest in time in EITHER direction — ties go to
    the backward (earlier) match, coincident-timestamp purchases count
    as backward at distance zero. `join_asof` is the backward-only
    classic; this is the other direction the as-of family supports.

    Spark-first plan: STILL one corpus-sized shuffle (plus the purchase
    side's small (user_id, ts) pre-reduce, as in `join_asof`) — the same
    tagged union sorted once per user carries BOTH candidates: the
    backward match is
    last(ignorenulls) over the preceding frame, the forward match
    first(ignorenulls) over the following frame, and the pick is a
    map-side CASE on integer epoch-µs gaps (timezone-independent,
    DuckDB `epoch_us` mirror). No range join, no BroadcastNestedLoop,
    no second exchange — at 100 TB this is one sort-merge pass exactly
    like the backward variant. Determinism: coincident purchases
    pre-reduce to max event_id, the (ts, side) ordering is total, and
    the tie rule is fixed (backward wins equal gaps)."""
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
    w_back = (
        W.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    p_ts = F.when(F.col("side") == 0, F.col("ts"))
    us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {})"
    tagged = (
        clicks.unionByName(purch)
        .withColumn("back_id", F.last("p_id", ignorenulls=True).over(w_back))
        .withColumn("back_ts", F.last(p_ts, ignorenulls=True).over(w_back))
        .withColumn("fwd_id", F.first("p_id", ignorenulls=True).over(w_fwd))
        .withColumn("fwd_ts", F.first(p_ts, ignorenulls=True).over(w_fwd))
        .filter(F.col("side") == 1)
    )
    gap_back = F.expr(us.format("ts")) - F.expr(us.format("back_ts"))
    gap_fwd = F.expr(us.format("fwd_ts")) - F.expr(us.format("ts"))
    direction = (
        F.when(
            F.col("back_id").isNotNull()
            & (F.col("fwd_id").isNull() | (gap_back <= gap_fwd)),
            "backward",
        )
        .when(F.col("fwd_id").isNotNull(), "forward")
        .otherwise(F.lit(None).cast("string"))
    )
    return tagged.select(
        "event_id",
        "user_id",
        "ts",
        F.when(direction == "backward", F.col("back_id"))
        .when(direction == "forward", F.col("fwd_id"))
        .cast("long")
        .alias("nearest_purchase_id"),
        F.when(direction == "backward", F.col("back_ts"))
        .when(direction == "forward", F.col("fwd_ts"))
        .alias("nearest_purchase_ts"),
        direction.alias("direction"),
    )
