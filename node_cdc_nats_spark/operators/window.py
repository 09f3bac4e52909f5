"""Window functions (SURVEY.md §2.2 "Window functions").

Reference analog: the per-subscription ``received`` counter at
``/root/reference/lib/nats.js:97`` is a degenerate ``row_number`` over
arrival order. Here it generalizes to rank / lag / lead / running frames.
Ordering keys always end in a unique column (event_id / orderkey) so window
results are deterministic under any partitioning — required both for the
oracle diff and for stable results under AQE at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io import load_table
from ..registry import register
from .exact import DEC


@register(
    "win_rank",
    oracle="""
    SELECT c_custkey, c_nationkey,
           RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk,
           CAST(NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS quartile
    FROM customer
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    by_bal = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    by_bal_uniq = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(by_bal).alias("rnk"),
        F.dense_rank().over(by_bal).alias("drnk"),
        F.ntile(4).over(by_bal_uniq).cast("int").alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           LAG(value, 2, -1.0) OVER w AS prev2_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


@register(
    "win_running",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seen
    FROM events
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("seen"),
    )


@register(
    "win_frame_sliding",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum3,
           MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max3
    FROM events
    """,
)
def win_frame_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, W.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("sum3"),
        F.max("value").over(w).alias("max3"),
    )


@register(
    "win_percent",
    oracle="""
    SELECT s_suppkey,
           PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey) AS pr,
           CUME_DIST() OVER (ORDER BY s_acctbal, s_suppkey) AS cd
    FROM supplier
    """,
)
def win_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single 100-row partition: global window is fine here; at scale a global
    # ORDER BY window would need range partitioning (documented trade-off).
    s = load_table(spark, sf_dir, "supplier")
    w = W.orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@register(
    "win_ntile",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
           NTILE(10) OVER (PARTITION BY c_nationkey
                           ORDER BY c_acctbal, c_custkey) AS decile_in_nation
    FROM customer
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth bucketing (quartiles global, deciles per nation) with a
    unique-key tie-break so bucket assignment is deterministic on both
    engines. The global NTILE is single-partition by construction
    (documented trade-off, same as win_percent); the per-nation variant
    is the scale path."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.ntile(4).over(W.orderBy("c_acctbal", "c_custkey")).alias("quartile"),
        F.ntile(10)
        .over(W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey"))
        .alias("decile_in_nation"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER (PARTITION BY user_id ORDER BY value
                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS sum_near,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY value
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
             AS n_near
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per user, aggregate every event whose `value`
    lies within 5.0 BELOW the current row's value — a value-distance frame,
    which ROWS frames (win_frame_sliding) cannot express. RANGE frames are
    peer-inclusive and bounded by the ORDER BY value itself, so the result
    is deterministic without any tiebreak column. The sum accumulates in
    DECIMAL (values carry 2 decimals, exact) and casts to double at the
    edge, keeping the cross-engine hash bit-stable. One shuffle on the
    partition key; per-user frames never cross partitions."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("value").rangeBetween(-5, W.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("sum_near"),
        F.count(F.lit(1)).over(w).alias("n_near"),
    )
