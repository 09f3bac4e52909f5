"""Additional TPC-H-style composition flagships (round-5 breadth).

The reference is a transport client with no relational surface
(``/root/reference/lib/nats.js`` — its only predicate is the MQTT channel
match at lib/nats.js:94-96); these queries exist to prove the engine
composes scans, joins, and aggregation the way a warehouse user would at
100 TB. Each one is chosen for a *distinct* physical-plan shape:

- ``q6_forecast_revenue`` — the pushdown story: every predicate reaches
  the parquet scan, one-row global agg, zero joins, zero wide shuffles.
- ``q14_promo_effect`` — fact ⋈ dimension with a conditional aggregate;
  ``part`` is a genuine dimension (SF×200k rows) so it carries no
  broadcast pin — AQE picks broadcast at fixture scale and may shuffle
  at 100 TB, which is the correct behavior at both ends.
- ``q18_large_volume`` — self-referential semi-join: a groupBy-HAVING on
  the fact table feeds a semi-join back into the 3-way join, the classic
  "find the outliers, then explain them" two-phase plan.
- ``q9_nation_revenue`` — fact ⋈ unbounded supplier ⋈ bounded nation:
  only ``nation`` (25 rows, bounded by construction) gets the broadcast
  pin; supplier scales with SF and is left to AQE.

The trimmed driver fixtures omit ``l_commitdate``/``l_receiptdate``/
``l_shipmode``/``p_container`` and the whole ``partsupp`` table, so TPC-H
Q4/Q12/Q19/Q2/Q9-exact are not expressible; Q9 here is the standard
no-partsupp adaptation (revenue, not profit, by supplier nation × year).

Float determinism: every SUM goes through :func:`~.exact.dsum` (decimal
accumulation — exact, therefore partition-order- and engine-independent);
ratios divide the two exact sums as doubles, which is bit-identical given
identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..registry import register
from .exact import dsum, sql_dsum

_SQL_NET = "l_extendedprice * (1 - l_discount)"


def _net():
    """Per-line net revenue (built per-call: Column exprs need a live session)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q6: forecast revenue change — the purest pushdown benchmark. All four
# predicates are scan-level (PushedFilters shows shipdate range + discount
# range + quantity); the agg is a one-row partial+final with no groupBy
# shuffle width. At 100 TB this reads ~1 year / ~2% of rows and 3 columns.
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: fully-pushed-down single-scan revenue-change agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q14: promo revenue share — conditional aggregate over a fact ⋈ dimension
# join. The month filter pushes into the lineitem scan BEFORE the join, so
# the join input is ~1/84th of the fact table; part carries no broadcast
# pin (it is SF-proportional — AQE broadcasts it at fixture scale and is
# free to shuffle at 100 TB).
# ---------------------------------------------------------------------------
@register(
    "q14_promo_effect",
    oracle=f"""
    SELECT 100.0 * {sql_dsum("CASE WHEN p_type = 'PROMO' THEN " + _SQL_NET + " ELSE 0.0 END")}
           / {sql_dsum(_SQL_NET)} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share via conditional agg over fact ⋈ part."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    month = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    promo_net = F.when(F.col("p_type") == "PROMO", _net()).otherwise(F.lit(0.0))
    return (
        month.join(part, month["l_partkey"] == part["p_partkey"])
        .agg((F.lit(100.0) * dsum(promo_net) / dsum(_net())).alias("promo_revenue"))
    )


# ---------------------------------------------------------------------------
# Q18: large-volume customers — groupBy-HAVING on the fact table semi-joined
# back into a 3-way join. Two fact shuffles total (the HAVING agg and the
# final agg); the semi-join key set is tiny (top ~0.3% of orders) so AQE
# turns the semi-join into a broadcast at any scale. Deterministic LIMIT:
# the sort adds o_orderkey as a tiebreaker on both engines.
# ---------------------------------------------------------------------------
@register(
    "q18_large_volume",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING {sql_dsum('l_quantity')} > 300.0
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders via groupBy-HAVING semi-join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300.0)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(big, orders["o_orderkey"] == big["big_orderkey"], "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9 (no-partsupp adaptation): revenue by supplier nation × ship year.
# supplier is SF-proportional (NO broadcast pin — AQE decides); nation is
# bounded at 25 rows and pinned. One agg shuffle on a 25×7-key space.
# ---------------------------------------------------------------------------
@register(
    "q9_nation_revenue",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(l_shipdate) AS BIGINT) AS o_year,
           {sql_dsum(_SQL_NET)} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name, CAST(year(l_shipdate) AS BIGINT)
    ORDER BY n_name, o_year DESC
    """,
)
def q9_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (no-partsupp adaptation): revenue by supplier nation × ship year."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
            _net().alias("net"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("net").alias("revenue"))
        .orderBy("nation", F.col("o_year").desc())
    )
