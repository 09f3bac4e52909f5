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
from pyspark.sql.window import Window

from ..io import load_table
from ..registry import register
from .exact import davg, dsum, sql_davg, sql_dsum

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


# ---------------------------------------------------------------------------
# Round-5 breadth: nine more TPC-H plan shapes. The fixtures omit
# l_commitdate / l_receiptdate / l_shipmode / p_container / partsupp, so
# Q4/Q17/Q19/Q21/Q22 are the standard adaptations onto the columns that do
# exist (documented per-query); Q7/Q8/Q13/Q15 are the genuine articles.
# ---------------------------------------------------------------------------

_TS = "timestamp_ntz"


def _ts(s: str):
    return F.lit(s).cast(_TS)


# Q4 (adapted): EXISTS → semi-join with a non-equi residual. l_commitdate/
# l_receiptdate don't exist, so "late" = shipped >90 days after the order
# date; the plan shape (pushed-down date window on orders, semi-join into
# the fact with an equi key + residual predicate, tiny-key agg) is Q4's.
@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority census via EXISTS semi-join (late-ship adaptation)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = orders.filter(
        (F.col("o_orderdate") >= _ts("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-10-01 00:00:00"))
    )
    late = (window["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] > window["o_orderdate"] + F.expr("INTERVAL 90 DAYS")
    )
    return (
        window.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# Q7: volume shipping between two nations. The classic double-dimension
# join: nation joins twice under different roles (supplier side, customer
# side) with a disjunctive cross-pair predicate. Both nation sides are
# bounded (25 rows) and broadcast-pinned; the three SF-proportional joins
# (fact ⋈ supplier ⋈ orders ⋈ customer) are left to AQE.
@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {sql_dsum(_SQL_NET)} AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS BIGINT)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: cross-nation revenue; nation joined twice under two roles."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    shipped = li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    return (
        shipped.join(supp, shipped["l_suppkey"] == supp["s_suppkey"])
        .join(orders, shipped["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _net().alias("net"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("net").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# Q8: national market share — the deepest join in the set (7 tables).
# region restricts the CUSTOMER side through nation⋈region (both bounded,
# pre-joined and broadcast as one 25-row key list); the supplier-side
# nation is the 25-row labeling dimension, also broadcast. part carries
# the only selective predicate (p_type) and is SF-proportional, so it is
# NOT pinned — AQE broadcasts it at fixture scale, may shuffle at 100 TB.
@register(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {sql_dsum("CASE WHEN n2.n_name = 'NATION_3' THEN " + _SQL_NET + " ELSE 0.0 END")}
           / {sql_dsum(_SQL_NET)} AS mkt_share
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
      AND p_type = 'ECONOMY'
    GROUP BY CAST(year(o_orderdate) AS BIGINT)
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of ECONOMY-part revenue sold into ASIA."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") <= _ts("1997-12-31 00:00:00"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # Customer-side region restriction: nation⋈region collapses to a
    # ≤25-row key list before touching anything SF-proportional.
    asia_nations = nation.join(
        region.filter(F.col("r_name") == "ASIA"),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select(F.col("n_nationkey").alias("cust_nk"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_name")
    )
    joined = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(asia_nations), cust["c_nationkey"] == F.col("cust_nk"))
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(supp_nation), supp["s_nationkey"] == F.col("supp_nk"))
    )
    target_net = F.when(F.col("supp_name") == "NATION_3", _net()).otherwise(F.lit(0.0))
    return (
        joined.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _net().alias("net"),
            target_net.alias("tnet"),
        )
        .groupBy("o_year")
        .agg((dsum("tnet") / dsum("net")).alias("mkt_share"))
        .orderBy("o_year")
    )


# Q13: customer order-count distribution — outer join with a predicate in
# the JOIN CONDITION (not WHERE: customers with zero qualifying orders
# must survive with count 0), then a second aggregation over the first's
# output. Two shuffles by construction; the second is over ≤ max-order-
# count keys, i.e. tiny.
@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: per-customer order counts, then the distribution of those counts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            cust["c_custkey"] == orders["o_custkey"],
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# Q15: top supplier — a derived aggregate consumed twice (once as the
# join input, once reduced to its global max). The max is a 1-row agg
# broadcast into an equality filter, NOT a window over an empty
# partitioning (which would serialize the whole aggregate through one
# task at scale). Exact decimal sums make the double equality safe and
# engine-portable.
@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {sql_dsum(_SQL_NET)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue via 1-row max broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .select(F.col("l_suppkey").alias("supplier_no"), _net().alias("net"))
        .groupBy("supplier_no")
        .agg(dsum("net").alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# Q17 (adapted): small-quantity revenue — correlated scalar subquery
# (per-part average) decorrelated into an aggregate + equi-join. The
# per-part threshold is computed only for parts passing the part filter
# (semi-join pre-restriction — the correlation key makes that sound),
# so the extra fact shuffle is over ~1/25 of lineitem, not all of it.
# p_container doesn't exist; p_brand + p_size stand in. 0.5·avg replaces
# 0.2·avg because fixture quantities are uniform 1..50 (0.2·avg ≈ 5
# selects almost nothing at the 10th percentile).
@register(
    "q17_small_quantity",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND p_size < 25
      AND l_quantity < (SELECT 0.5 * ({sql_davg('l2.l_quantity')})
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: below-half-average-quantity revenue for one brand."""
    li = load_table(spark, sf_dir, "lineitem")
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_size") < 25))
        .select("p_partkey")
    )
    thresholds = (
        li.join(part_f, li["l_partkey"] == part_f["p_partkey"], "left_semi")
        .groupBy("l_partkey")
        .agg((F.lit(0.5) * davg("l_quantity")).alias("qty_threshold"))
        .select(F.col("l_partkey").alias("t_partkey"), "qty_threshold")
    )
    return (
        li.join(part_f, li["l_partkey"] == part_f["p_partkey"])
        .join(thresholds, li["l_partkey"] == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# Q19 (adapted): disjunctive multi-table predicate. Each OR-arm mixes
# part and lineitem columns, so Catalyst cannot push the disjunction to
# either scan by itself; the per-table envelope conjuncts (brand IN,
# size/quantity ranges) are stated EXPLICITLY so they reach the parquet
# scans as PushedFilters while the exact disjunction evaluates post-join.
# p_container / l_shipmode / l_shipinstruct don't exist; p_size and
# l_quantity bands carry the same shape.
_Q19_ARMS_SQL = """
   (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 35)
"""


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dsum(_SQL_NET)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE {_Q19_ARMS_SQL}
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions across the join, envelopes pushed down."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 35)  # envelope → scan
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 30)  # envelope → scan
    )
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") <= smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .filter(
            arm("Brand#1", 10, 1, 15) | arm("Brand#2", 20, 10, 25) | arm("Brand#3", 30, 20, 35)
        )
        .agg(dsum(_net()).alias("revenue"))
    )


# Q21 (adapted): suppliers who kept orders waiting. The textbook plan is
# THREE fact self-joins (l1 ⋈ EXISTS l2 ⋈ NOT EXISTS l3); this engine
# instead folds both existentials into ONE per-order aggregate — a single
# fact shuffle computing (distinct suppliers, distinct late suppliers,
# the late supplier) per order, then filtering n_supp≥2 ∧ n_late=1. The
# oracle keeps the independent EXISTS/NOT-EXISTS formulation, so the
# rewrite is verified, not assumed. "Late" = shipped >60 days after the
# order date (no l_commitdate/l_receiptdate in the fixtures); a waiting
# order counts once per supplier (COUNT(DISTINCT o_orderkey)).
@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(DISTINCT o_orderkey) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: sole-late-supplier census, self-joins folded to one agg."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    lines = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "late"
        ),
    )
    # Two-level aggregation instead of countDistinct: multi-distinct
    # compiles to an Expand (3× the shuffled rows) plus an extra
    # gid-keyed exchange. Collapsing to (order, supplier) pairs first
    # gives two narrow combiner-friendly shuffles and no row multiply.
    per_pair = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("supp_late")
    )
    late_supp = F.when(F.col("supp_late"), F.col("l_suppkey"))
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.count(late_supp).alias("n_late"),
        F.max(late_supp).alias("waiting_suppkey"),
    )
    waiting = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    return (
        waiting.join(supp, F.col("waiting_suppkey") == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


# Q22 (adapted): dormant big-balance customers. No c_phone in the
# fixtures, so the country-code prefix becomes c_nationkey mod 5; "never
# ordered" (empty at sf0.01 — every fixture customer has ~10 orders)
# becomes "no order since 1999-01-01". Shape preserved: uncorrelated
# scalar subquery (1-row avg broadcast) + anti-join + grouped agg.
@register(
    "q22_sales_opportunity",
    oracle=f"""
    SELECT cntrycode, COUNT(*) AS numcust, {sql_dsum('c_acctbal')} AS totacctbal
    FROM (SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal
          FROM customer
          WHERE c_nationkey % 5 IN (0, 1, 2, 3)
            AND c_acctbal > (SELECT {sql_davg('c_acctbal')} FROM customer
                             WHERE c_acctbal > 0.0 AND c_nationkey % 5 IN (0, 1, 2, 3))
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
         ) dormant
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    in_codes = (F.col("c_nationkey") % 5).isin(0, 1, 2, 3)
    avg_bal = (
        cust.filter(in_codes & (F.col("c_acctbal") > 0.0))
        .agg(davg("c_acctbal").alias("avg_bal"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= _ts("1999-01-01 00:00:00")
    ).select("o_custkey")
    return (
        cust.filter(in_codes)
        .join(F.broadcast(avg_bal))  # 1-row uncorrelated scalar subquery
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# The last five TPC-H shapes (Q2/Q11/Q12/Q16/Q20) all need the partsupp
# table the fixtures omit. The faithful stand-in is the part-supplier
# relation lineitem actually witnesses: DISTINCT (l_partkey, l_suppkey) is
# partsupp's key, all-time shipped quantity stands in for ps_availqty, and
# the minimum observed unit price (l_extendedprice / l_quantity) stands in
# for ps_supplycost. Deriving it costs ONE fact shuffle on (partkey,
# suppkey) — a grouping ~4× narrower than the (orderkey, suppkey) shuffle
# q21 already carries — and each query below fuses whatever per-pair
# aggregate it needs into that same single pass (never one shuffle for the
# distinct and another for the aggregate).
# ---------------------------------------------------------------------------


# Q2 (adapted): minimum-cost supplier per part. The textbook correlated
# MIN-subquery is decorrelated into ONE window MIN over p_partkey on the
# eligible join output — the classic rewrite, one extra narrow shuffle on
# partkey instead of a second full join tree. region/nation are bounded by
# construction (5/25 rows) and broadcast-pinned; part, supplier, and the
# derived pair relation scale with SF and are left to AQE.
@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                       MIN(l_extendedprice / l_quantity) AS ps_supplycost
                FROM lineitem GROUP BY 1, 2),
    elig AS (SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
             FROM part JOIN ps ON p_partkey = ps_partkey
             JOIN supplier ON s_suppkey = ps_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             WHERE p_size = 15 AND r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
    FROM (SELECT *, MIN(ps_supplycost) OVER (PARTITION BY p_partkey) AS mc
          FROM elig)
    WHERE ps_supplycost = mc
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest EUROPE supplier per size-15 part
    (correlated MIN decorrelated to a partkey-window minimum).

    The size filter semi-joins into lineitem BELOW the pair aggregate:
    the per-pair min cost is computed per partkey, so restricting
    partkeys first shrinks the (partkey, suppkey) shuffle ~50× (1 of 50
    sizes) without changing any surviving pair's minimum. The oracle
    keeps the aggregate-over-everything formulation, so the pushdown is
    verified, not assumed."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    ps = (
        li.join(part.select("p_partkey"), li["l_partkey"] == F.col("p_partkey"), "left_semi")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    elig = (
        part.join(ps, part["p_partkey"] == ps["ps_partkey"])
        .join(supp, ps["ps_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
    )
    w = Window.partitionBy("p_partkey")
    return (
        elig.withColumn("mc", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("mc"))
        .drop("mc")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
    )


# Q11 (adapted): important stock by value. partsupp value becomes net
# revenue per part from NATION_3's suppliers; the HAVING-against-a-
# -fraction-of-total scalar is a 1-row broadcast over the SAME grouped
# relation (computed once in SQL via a CTE; Spark re-derives the 1-row
# total from the grouped plan — decimal accumulation makes the two
# totals bit-identical regardless of partitioning). nation is pinned,
# supplier/fact left to AQE.
@register(
    "q11_important_stock",
    oracle=f"""
    WITH val AS (SELECT l_partkey AS ps_partkey,
                        {sql_dsum(_SQL_NET)} AS value
                 FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation ON s_nationkey = n_nationkey
                 WHERE n_name = 'NATION_3' GROUP BY 1)
    SELECT ps_partkey, value FROM val
    WHERE value > (SELECT {sql_dsum('value')} * 0.001 FROM val)
    ORDER BY value DESC, ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose NATION_3-supplied value exceeds 0.1%
    of that nation's total (global-fraction HAVING via 1-row broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(dsum(_net()).alias("value"))
    )
    total = val.agg((dsum("value") * 0.001).alias("threshold"))
    return (
        val.join(F.broadcast(total))  # 1-row uncorrelated scalar subquery
        .filter(F.col("value") > F.col("threshold"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


# Q12 (adapted): shipping-delay vs order-priority census. l_shipmode/
# l_commitdate/l_receiptdate don't exist, so the mode axis becomes
# l_returnflag and "late" = shipped >90 days after the order date; the
# shape is Q12's exactly — a pushed-down one-year date window on the fact
# scan, an equi-join to orders with a non-equi residual, and a conditional
# two-way count on a 3-value group key. Counts are longs: exact, no
# decimal machinery needed.
@register(
    "q12_late_priority",
    oracle="""
    SELECT l_returnflag,
           -- CAST: DuckDB SUM(int) is HUGEINT → pandas float64 → the
           -- driver's dtype-sensitive hash mismatches Spark's int64 on
           -- EQUAL values (the r5 hash-fail root cause).
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment lines split by order priority."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))  # → scan
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# Q16 (adapted): supplier diversity per part attribute. The pair relation
# is the lineitem-witnessed DISTINCT (partkey, suppkey); "complaint"
# suppliers (no s_comment column) become negative-balance suppliers,
# excluded by an anti-join. COUNT(DISTINCT) is the same two-level
# aggregation q21 uses — (brand, type, size, suppkey) dedup first, then a
# narrow count — avoiding the Expand-based multi-distinct plan.
@register(
    "q16_supplier_count",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts by (brand, type, size),
    complaint suppliers anti-joined out.

    The part attribute filters semi-join into lineitem BELOW the
    distinct-pair shuffle (~13% of parts qualify, so ~7× less shuffled),
    then the qualifying pairs join part again for the output attributes —
    identical result, verified against the distinct-everything oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    complaints = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .join(part.select("p_partkey"), li["l_partkey"] == F.col("p_partkey"), "left_semi")
        .distinct()
    )
    return (
        pairs.join(part, pairs["l_partkey"] == part["p_partkey"])
        .join(complaints, pairs["l_suppkey"] == complaints["s_suppkey"], "left_anti")
        # two-level distinct count: dedup on the full key, then narrow count
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# Q20 (adapted): suppliers sitting on excess stock. ps_availqty becomes
# all-time shipped quantity per pair and the year window's share of it is
# the excess test (>30%); BOTH per-pair aggregates fuse into ONE fact
# shuffle (conditional dsum inside the same groupBy — not one pass for
# availqty and another for the year). The part-name prefix pushes to the
# scan as StartsWith; the supplier restriction is a semi-join; nation is
# pinned broadcast.
@register(
    "q20_excess_stock",
    oracle=f"""
    WITH ss AS (SELECT l_partkey, l_suppkey,
                       {sql_dsum('l_quantity')} AS availqty,
                       {sql_dsum(
                           "CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
                           " AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
                           " THEN l_quantity ELSE 0.0 END"
                       )} AS qty1996
                FROM lineitem GROUP BY 1, 2),
    excess AS (SELECT DISTINCT l_suppkey FROM ss
               JOIN part ON p_partkey = l_partkey
               WHERE p_name LIKE 'small%' AND qty1996 > 0.3 * availqty)
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1' AND s_suppkey IN (SELECT l_suppkey FROM excess)
    ORDER BY s_name
    """,
)
def q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_1 suppliers whose 1996 shipments of
    'small%' parts exceed 30% of their all-time quantity.

    The part-name restriction joins BELOW the pair aggregate: only
    'small%' partkeys can reach the excess set, and the per-pair sums
    are computed per partkey, so pre-filtering shrinks the
    (partkey, suppkey) shuffle to the qualifying parts' share of the
    fact table (~10× here) without changing any surviving pair's
    aggregate. The oracle keeps the aggregate-then-join formulation, so
    the pushdown is verified, not assumed."""
    li = load_table(spark, sf_dir, "lineitem")
    in_1996 = (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00")) & (
        F.col("l_shipdate") < _ts("1997-01-01 00:00:00")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    excess = (
        li.join(part, li["l_partkey"] == part["p_partkey"], "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            dsum("l_quantity").alias("availqty"),
            dsum(F.when(in_1996, F.col("l_quantity")).otherwise(0.0)).alias("qty1996"),
        )
        .filter(F.col("qty1996") > 0.3 * F.col("availqty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(excess, supp["s_suppkey"] == excess["l_suppkey"], "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
