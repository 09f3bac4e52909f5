"""Relational core: scans, projection, filter, joins, aggregation, sort /
limit / top-k, set ops (SURVEY.md §2.2 rows "Scans" through "Set ops").

The reference has none of these (its only predicate is the MQTT channel
match, ``/root/reference/lib/nats.js:94-96``); they are required so the CDC
history the engine captures is actually queryable. Everything here is
declarative DataFrame API — Catalyst handles pushdown, pruning, join
selection and partial aggregation; explicit ``broadcast()`` hints mark the
dimension tables that must never shuffle at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..cache import managed_persist
from ..io import load_table
from ..registry import register
from .exact import DEC, davg, dsum, sql_davg, sql_dsum


# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — scan → filter → agg → sort.
# One shuffle (partial+final hash agg); filter and 7-column pruning push into
# the parquet scan, so at 100 TB only ~2/3 of rows and 7/11 columns are read.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Projection (reference analog: protobuf decode-as-projection, S2)
# ---------------------------------------------------------------------------
@register(
    "project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_quantity * 2.0 AS double_qty
    FROM lineitem
    """,
)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (F.col("l_quantity") * F.lit(2.0)).alias("double_qty"),
    )


# ---------------------------------------------------------------------------
# Filter / predicate (reference analog: MQTT pattern gate, S3)
# ---------------------------------------------------------------------------
@register(
    "filter_predicate",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
      AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_totalprice") > 150000.0)
        & (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp_ntz"))
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------
@register(
    "join_inner",
    oracle="""
    SELECT c_custkey, c_name, n_name AS nation, r_name AS region
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # nation/region are bounded dimensions — broadcast regardless of fact size.
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


@register(
    "join_left",
    oracle=f"""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"), dsum("o_totalprice").alias("total_spent"))
    )


@register(
    "join_right",
    oracle="""
    SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal < -900.0
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .filter(F.col("c_acctbal") < -900.0)
        .select("c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice")
    )


@register(
    "join_full",
    oracle="""
    SELECT ckey, skey FROM
      (SELECT DISTINCT c_nationkey AS ckey FROM customer WHERE c_acctbal < -750.0) a
      FULL JOIN
      (SELECT DISTINCT s_nationkey AS skey FROM supplier WHERE s_acctbal > 8000.0) b
      ON a.ckey = b.skey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.filter(F.col("c_acctbal") < -750.0).select(F.col("c_nationkey").alias("ckey")).distinct()
    b = s.filter(F.col("s_acctbal") > 8000.0).select(F.col("s_nationkey").alias("skey")).distinct()
    return a.join(b, a.ckey == b.skey, "full").select("ckey", "skey")


@register(
    "join_semi",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") >= 49.0)
    return o.join(big, o.o_orderkey == big.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "customers with no urgent order" — non-empty at every SF (every
    # customer has *some* order in the fixtures, so the unfiltered anti
    # join verified nothing).
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_range",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n,
           {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem JOIN part
      ON l_partkey = p_partkey
     AND l_quantity BETWEEN p_size - 2 AND p_size + 2
    GROUP BY p_brand
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # Equi key carries the shuffle; the range residual is evaluated post-match,
    # so this stays a hash/sort-merge join (never a nested-loop) at scale.
    # `part` is SF-proportional (200k rows/SF), so it carries NO broadcast
    # hint: AQE picks broadcast at fixture scale from runtime sizes, and a
    # shuffle join at the 100 TB target — a pinned hint would be honored
    # regardless of size and OOM the executors (r5 verdict).
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size - 2)
        & (li.l_quantity <= p.p_size + 2)
    )
    return (
        li.join(p, cond)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("sum_price"))
    )


@register(
    "join_theta",
    oracle="""
    SELECT a.s_suppkey AS sk1, b.s_suppkey AS sk2
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_acctbal < b.s_acctbal
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    a = s.select(F.col("s_suppkey").alias("sk1"), F.col("s_nationkey").alias("nk1"), F.col("s_acctbal").alias("ab1"))
    b = s.select(F.col("s_suppkey").alias("sk2"), F.col("s_nationkey").alias("nk2"), F.col("s_acctbal").alias("ab2"))
    return a.join(b, (a.nk1 == b.nk2) & (a.ab1 < b.ab2)).select("sk1", "sk2")


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------
@register(
    "agg_count",
    oracle="SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority",
)
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@register(
    "agg_sum",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum('l_quantity')} AS sum_qty,
           CAST(SUM(l_orderkey) AS BIGINT) AS sum_key
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.sum("l_orderkey").alias("sum_key"),
    )


@register(
    "agg_avg",
    oracle=f"SELECT event_type, {sql_davg('value')} AS avg_value FROM events GROUP BY event_type",
)
def agg_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(davg("value").alias("avg_value"))


@register(
    "agg_min_max",
    oracle="""
    SELECT event_type,
           MIN(value) AS min_value, MAX(value) AS max_value,
           MIN(CAST(ts AS TIMESTAMP)) AS first_ts, MAX(CAST(ts AS TIMESTAMP)) AS last_ts
    FROM events GROUP BY event_type
    """,
)
def agg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@register(
    "agg_multi",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {sql_dsum('l_extendedprice')} AS sum_price,
           {sql_davg('l_quantity')} AS avg_qty,
           MIN(l_discount) AS min_disc, MAX(l_tax) AS max_tax
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("sum_price"),
        davg("l_quantity").alias("avg_qty"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_tax").alias("max_tax"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


# HLL sketch values are implementation-specific (no cross-engine oracle),
# so the query emits the EXACT counts plus engine-independent boolean
# error gates: the oracle asserts `true` for each gate, making the hash
# check meaningful — it verifies the exact counts AND that Spark's HLL
# landed within the documented ~2.3% default relative standard deviation
# (10% gate leaves wide margin). HLL is deterministic for a fixed input
# set, so the gate is stable across runs.
@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           true AS parts_within_10pct,
           true AS orders_within_10pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    within = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= 0.1 * F.col(exact)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_partkey").alias("_approx_parts"),
            F.approx_count_distinct("l_orderkey").alias("_approx_orders"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "exact_orders",
            within("_approx_parts", "exact_parts").alias("parts_within_10pct"),
            within("_approx_orders", "exact_orders").alias("orders_within_10pct"),
        )
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
           COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
           COUNT(*) AS n, {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k (reference analog: max-bounded delivery, S5)
# ---------------------------------------------------------------------------
@register(
    "sort",
    oracle="SELECT s_suppkey, s_name, s_acctbal FROM supplier ORDER BY s_acctbal DESC, s_suppkey",
)
def sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select("s_suppkey", "s_name", "s_acctbal").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )


@register(
    "limit",
    oracle="SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 20",
)
def limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name").orderBy("c_custkey").limit(20)


@register(
    "topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # orderBy().limit(k) compiles to TakeOrderedAndProject: per-partition
    # top-k then a k-row merge on the driver — no global sort at scale.
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Set ops (reference analog: multi-response-subject union in RPC, S7)
# ---------------------------------------------------------------------------
@register(
    "union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    views = e.filter(F.col("event_type") == "view").select("user_id")
    return clicks.unionByName(views).distinct()


@register(
    "union_all",
    oracle="""
    SELECT event_id, user_id FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT event_id, user_id FROM events WHERE value > 95.0
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    errs = e.filter(F.col("event_type") == "error").select("event_id", "user_id")
    hot = e.filter(F.col("value") > 95.0).select("event_id", "user_id")
    return errs.unionByName(hot)


@register(
    "intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "except_distinct",
    oracle="""
    SELECT event_id FROM events WHERE value > 90.0
    EXCEPT
    SELECT event_id FROM events WHERE event_type = 'error'
    """,
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # event_id-level sets: only 150 distinct user_ids exist in the fixture
    # and every one appears under every event_type, so a user_id-level
    # EXCEPT was verified-empty. Hot non-error events are non-empty at
    # every SF.
    e = load_table(spark, sf_dir, "events")
    hot = e.filter(F.col("value") > 90.0).select("event_id")
    errs = e.filter(F.col("event_type") == "error").select("event_id")
    return hot.subtract(errs)  # EXCEPT (distinct) semantics


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority flagship (TPC-H Q3 shape): a 3-table star join with
    selective dimension filters, aggregation, and top-k. Plan to look for in
    .explain: both dimension filters pushed into their scans; customer
    (post-filter) broadcast into orders, that result broadcast or shuffled
    into lineitem (AQE decides from runtime sizes); partial aggregation
    before the final top-k sort — lineitem is the only 100 TB side and is
    scanned exactly once, filtered at the scan."""
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # No hint on the orders⋈customer result or the lineitem join: both sides
    # scale with SF (the filtered orders set is ~45% of orders — hundreds of
    # GB at 100 TB), so AQE must size the strategy at runtime. Only the
    # segment-filtered customer side is a candidate dimension, and AQE will
    # broadcast it on its own when it fits.
    return (
        li.join(
            orders.join(cu, orders.o_custkey == cu.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
           COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (each flag alone, plus the grand total) with
    grouping_id disambiguating the null-filled dimensions. Catalyst expands
    to one Expand + single aggregation — one shuffle regardless of how many
    sets are requested."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT event_id,
           user_id % 10 AS hot_key,
           CONCAT('seg-', CAST(user_id % 10 AS VARCHAR)) AS dim_val
    FROM events
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join, the manual salting pattern for when BOTH sides
    are too large to broadcast and a handful of hot keys would pin the
    whole shuffle on a few reducers: the fact side gets a deterministic
    salt (event_id % S — reproducible, unlike rand()), the dimension side
    is replicated S times, and the join key becomes (key, salt), spreading
    each hot key over S reducers. Results are provably identical to the
    unsalted join (the oracle); AQE's skew-join handles the same problem
    adaptively when statistics are available, salting is the explicit
    contract when they are not. Shuffle join is forced via hint — a 10-row
    dim would otherwise broadcast, which IS the right plan outside a
    salting demo."""
    salt_n = 8
    ev = load_table(spark, sf_dir, "events")
    big = ev.select(
        "event_id",
        (F.col("user_id") % 10).alias("hot_key"),
        (F.col("event_id") % salt_n).alias("salt"),
    )
    dim = spark.range(10).select(
        F.col("id").alias("hot_key"),
        F.concat(F.lit("seg-"), F.col("id").cast("string")).alias("dim_val"),
    )
    dim_salted = dim.select(
        "hot_key", "dim_val",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(salt_n)])).alias("salt"),
    )
    return (
        big.join(dim_salted.hint("shuffle_merge"), ["hot_key", "salt"])
        .select("event_id", "hot_key", "dim_val")
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume flagship (TPC-H Q5 shape): a 6-table snowflake
    join where the customer and supplier must share a nation. Plan: region
    filter prunes nation — those fixed-cardinality dimensions (25/5 rows)
    broadcast by pin; orders is date-filtered at its scan; lineitem (the
    100 TB side) is scanned once, and the c/s same-nation condition rides
    the supplier join as a residual. Customer AND supplier scale linearly
    with SF, so neither carries a hint — AQE picks shuffle vs broadcast
    from runtime sizes, keeping the 100×-safety the planner's choice."""
    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re_ = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cu, (orders.o_custkey == cu.c_custkey))
        .join(
            # supplier is SF-proportional (10k rows/SF) — like customer it
            # carries NO pin; AQE broadcasts it at fixture scale and keeps
            # the 100×-safety the planner's choice (r5 verdict).
            su,
            (li.l_suppkey == su.s_suppkey) & (cu.c_nationkey == su.s_nationkey),
        )
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re_), na.n_regionkey == re_.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F_qty,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per l_linestatus value with explicit value list —
    with the values enumerated, Catalyst plans a single aggregation pass
    (no second scan to discover the domain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
        .select(
            "l_returnflag",
            F.col("F").alias("F_qty"),
            F.col("O").alias("O_qty"),
        )
    )


@register(
    "agg_stats",
    oracle="""
    WITH iv AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v FROM events)
    SELECT event_type,
           CAST(SUM(v) AS DOUBLE) / 100.0 AS s1,
           CAST(SUM(v * v) AS DOUBLE) / 10000.0 AS s2,
           (CAST(SUM(v * v) AS DOUBLE) / 10000.0
            - (CAST(SUM(v) AS DOUBLE) / 100.0) * (CAST(SUM(v) AS DOUBLE) / 100.0)
              / COUNT(v))
           / (COUNT(v) - 1) AS variance
    FROM iv GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic variance: built-in var_samp is a float reduction whose
    value depends on partial-aggregation order, so it can never hash-match
    another engine. Power sums over integer cents (exact, associative,
    within int64; bigint->double conversion is exact below 2^53) give a
    bit-stable variance under any partitioning — the engine's pattern for
    second-moment statistics. (Decimal power sums are NOT enough: the
    decimal->double cast itself rounds differently across engines.)"""
    ev = load_table(spark, sf_dir, "events")
    iv = F.round(F.col("value") * 100).cast("long")
    s1 = F.sum(iv).cast("double") / 100.0
    s2 = F.sum(iv * iv).cast("double") / 10000.0
    n = F.count("value")
    return ev.withColumn("_iv", iv).groupBy("event_type").agg(
        (F.sum("_iv").cast("double") / 100.0).alias("s1"),
        (F.sum(F.col("_iv") * F.col("_iv")).cast("double") / 10000.0).alias("s2"),
        (
            (
                F.sum(F.col("_iv") * F.col("_iv")).cast("double") / 10000.0
                - (F.sum("_iv").cast("double") / 100.0)
                * (F.sum("_iv").cast("double") / 100.0)
                / F.count("_iv")
            )
            / (F.count("_iv") - 1)
        ).alias("variance"),
    )


_BUCKETED: set[str] = set()


@register(
    "join_bucketed",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, COUNT(*) AS n_lines
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketing: both tables written bucketBy(8,
    orderkey) + sortBy into the session warehouse, so the join needs NO
    exchange on either side (sort-merge over pre-bucketed files) and the
    following per-orderkey aggregation reuses the same distribution — zero
    shuffles end-to-end, verified by tests/test_plan_shape.py. THE layout
    move for a 100 TB fact table that is joined on the same key every day:
    pay the shuffle once at write time, never at read time. Bucketed copies
    are staged once per process (the fixture's stand-in for the real
    warehouse tables)."""
    # Per-directory table names: a global name would let a second staged
    # SF in the same process silently repoint the first SF's cached query
    # at the wrong data. The tag digests the FULL path (not just the
    # basename) so it is unique exactly like the `_BUCKETED` cache key —
    # two dirs sharing a final component (/a/sf0.1 vs /b/sf0.1) get
    # distinct tables instead of clobbering each other (ADVICE r5).
    import hashlib
    import re

    norm = sf_dir.rstrip("/")
    sf_tag = (
        re.sub(r"[^A-Za-z0-9]", "_", norm.rsplit("/", 1)[-1])
        + "_"
        + hashlib.md5(norm.encode()).hexdigest()[:8]
    )
    t_orders, t_lineitem = f"bkt_orders_{sf_tag}", f"bkt_lineitem_{sf_tag}"
    key = f"bucketed::{norm}"
    if key not in _BUCKETED:
        # The warehouse directory outlives the (in-memory) catalog: drop any
        # prior-session table AND its leftover location before re-staging.
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for tbl in (t_orders, t_lineitem):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(f"{warehouse}/{tbl}", ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .saveAsTable(t_orders)
        )
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .saveAsTable(t_lineitem)
        )
        _BUCKETED.add(key)
    o = spark.table(t_orders)
    l = spark.table(t_lineitem)
    # hint("merge"): at fixture scale Spark would broadcast the small side
    # (also shuffle-free, but then bucketing proves nothing); at 100 TB
    # neither side broadcasts and sort-merge-over-buckets is the real plan.
    return (
        o.join(l.hint("merge"), o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "agg_quantiles",
    oracle="""
    SELECT event_type,
           QUANTILE_DISC(value, 0.25) AS p25,
           QUANTILE_DISC(value, 0.5) AS p50,
           QUANTILE_DISC(value, 0.9) AS p90,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles per group via percentile_disc — returns an
    actual data value (no interpolation arithmetic), so results are
    bit-identical across engines regardless of float rounding. At scale,
    exact percentiles need a full sort per group; percentile_disc
    aggregates within the one groupBy shuffle (no global sort). For the
    approximate/streaming path see agg_approx_distinct's HLL analog:
    approx_percentile with the same plan shape."""
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("__agg_quantiles_events")
    return spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY value) AS p90,
               COUNT(*) AS n
        FROM __agg_quantiles_events
        GROUP BY event_type
        """
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting flagship (TPC-H Q10 shape): which customers
    returned the most revenue in a quarter. Plan: date filter pushed into
    the orders scan, returnflag filter pushed into the lineitem scan
    (lineitem is the only 100 TB side, scanned once), nation broadcast
    (25 rows, hinted), and AQE left to size the customer⋈orders join —
    customer scales with SF, so no forced broadcast (the q3/q5 round-1
    lesson). Aggregation is partial+final around one shuffle on the
    customer grouping key; top-20 is TakeOrderedAndProject."""
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cu, orders.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@register(
    "agg_approx_quantiles",
    oracle="""
    SELECT event_type,
           QUANTILE_DISC(value, 0.5) AS p50_exact,
           QUANTILE_DISC(value, 0.9) AS p90_exact,
           true AS p50_within_5pct,
           true AS p90_within_5pct
    FROM events GROUP BY event_type
    """,
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) per event_type —
    the streaming/huge-cardinality path next to agg_quantiles' exact
    percentile_disc. Sketch values are engine-specific, so the query emits
    the EXACT discrete percentiles plus boolean error gates the oracle
    reproduces as `true` (hash-verifiable, same pattern as
    agg_approx_distinct). GK rank error is bounded by n/accuracy = n/1000
    ranks — at sf0.1's per-group counts that is a handful of ranks, far
    inside the 5% value gate (plus an absolute epsilon for near-zero
    values)."""
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("__agg_approx_quantiles_events")
    gate = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact))
        <= 0.05 * F.abs(F.col(exact)) + F.lit(1e-6)
    )
    base = spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50_exact,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90_exact,
               approx_percentile(value, 0.5, 1000) AS _p50_approx,
               approx_percentile(value, 0.9, 1000) AS _p90_approx
        FROM __agg_approx_quantiles_events
        GROUP BY event_type
        """
    )
    return base.select(
        "event_type",
        "p50_exact",
        "p90_exact",
        gate("_p50_approx", "p50_exact").alias("p50_within_5pct"),
        gate("_p90_approx", "p90_exact").alias("p90_within_5pct"),
    )


@register(
    "unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
    FROM lineitem WHERE l_quantity >= 45
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_quantity >= 45
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_quantity >= 45
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_quantity >= 45
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape (melt): the four lineitem measures unpivoted to
    (metric, val) rows — the inverse of agg_pivot, closing the reshape
    pair. Spark's native `unpivot` is a single map-side operator (one scan,
    no shuffle, no join): each input row emits 4 output rows inside the
    same task, so the reshape is embarrassingly parallel at any scale. The
    filter stays pushed into the parquet scan below the unpivot. Values
    move verbatim (no arithmetic), so the cross-engine hash is exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT event_type, value, COUNT(*) AS cnt
      FROM events GROUP BY event_type, value),
    r AS (
      SELECT event_type, value, cnt,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, value ASC) AS rn
      FROM c)
    SELECT event_type, value AS mode_value, CAST(cnt AS BIGINT) AS mode_count
    FROM r WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent `value` per event
    type, ties broken by smallest value. Built as count-groupBy +
    row_number rather than the engines' native MODE(), because both
    Spark's `mode()` and DuckDB's `MODE` are tie-nondeterministic — the
    explicit (count desc, value asc) ordering is what makes the result
    hashable cross-engine and reproducible run-to-run. Plan: partial+final
    count agg, then a window over the (tiny) distinct-value set, already
    partitioned compatibly."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    c = e.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("event_type").orderBy(F.col("cnt").desc(), F.col("value").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("value").alias("mode_value"),
            F.col("cnt").cast("long").alias("mode_count"),
        )
    )


@register(
    "agg_corr",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           -- GREATEST(.,0) clamps a rounding-induced negative before SQRT
           -- (DuckDB raises Out of Range there); NULLIF makes the
           -- zero-variance case NULL on BOTH engines (Spark's 0/0 is NaN,
           -- DuckDB's is NULL — ADVICE r5).
           (n * sxy - sx * sy)
             / NULLIF(SQRT(GREATEST(n * sxx - sx * sx, 0))
                      * SQRT(GREATEST(n * syy - sy * sy, 0)), 0)
             AS corr_qty_price,
           (n * sxy - sx * sy) / (n * n) AS covar_pop
    FROM s
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance of (quantity, price)
    per return flag — built from exact DECIMAL moment sums rather than the
    engines' native CORR/COVAR_POP, whose streaming/pairwise accumulation
    orders differ between Spark and DuckDB (and across partitionings) on
    the last ulp. Here every moment (Σx, Σy, Σx², Σy², Σxy) is an exact
    decimal sum cast to double, and the closing formula is ONE identical
    IEEE expression on both engines — bit-stable under AQE at any scale.
    Plan: single partial+final aggregation, same shape as q1."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    from .exact import DEC

    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x.cast(DEC)).cast("double").alias("sx"),
        F.sum(y.cast(DEC)).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(30,4)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(30,4)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(30,4)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # Zero-variance guard (ADVICE r5): clamp rounding-induced negatives
    # before sqrt and NULL the corr when either variance is zero, so a
    # degenerate group (constant x or y) yields NULL on BOTH engines
    # instead of Spark NaN vs DuckDB NULL/raise.
    denom = F.sqrt(F.greatest(n * sxx - sx * sx, F.lit(0.0))) * F.sqrt(
        F.greatest(n * syy - sy * sy, F.lit(0.0))
    )
    corr = F.when(denom > 0, (n * sxy - sx * sy) / denom)
    return agg.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        corr.alias("corr_qty_price"),
        ((n * sxy - sx * sy) / (n * n)).alias("covar_pop"),
    )


@register(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(30,4)))
                AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
             AS wavg_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag — the weighted
    mean every metrics layer needs, closed engine-exactly: numerator and
    denominator are DECIMAL-accumulated (order-independent under AQE —
    same machinery as `exact.dsum`), the quotient is ONE IEEE division
    identical on both engines. Plan: single partial+final hash agg."""
    li = load_table(spark, sf_dir, "lineitem")
    num = F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(30,4)"))
    den = F.sum(F.col("l_quantity").cast(DEC))
    return li.groupBy("l_returnflag").agg(
        (num.cast("double") / den.cast("double")).alias("wavg_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_string_agg",
    oracle="""
    SELECT n_regionkey,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): nation names per
    region, comma-joined in lexicographic order. Spark's collect_list is
    non-deterministic in arrival order, so the engine sorts the collected
    array BEFORE joining — the only way a concatenation aggregate can be
    exact across engines and across partitionings (collect order differs
    under AQE; sorted output does not). Plan: one hash agg on the tiny
    key; at 100 TB per-group result size is the real constraint — cap or
    switch to the top-k pattern when groups are unbounded."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "orders_rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey, last_order, frequency, monetary,
             NTILE(3) OVER (ORDER BY last_order DESC, o_custkey) AS r_tier,
             NTILE(3) OVER (ORDER BY frequency DESC, o_custkey)  AS f_tier,
             NTILE(3) OVER (ORDER BY monetary DESC, o_custkey)   AS m_tier
      FROM per_cust)
    SELECT CAST(r_tier AS INT) AS r_tier, CAST(f_tier AS INT) AS f_tier,
           CAST(m_tier AS INT) AS m_tier,
           COUNT(*) AS n_customers,
           CAST(MIN(o_custkey) AS BIGINT) AS example_custkey
    FROM scored GROUP BY r_tier, f_tier, m_tier
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency / frequency /
    monetary aggregates, each cut into terciles, then the 27-cell segment
    census. Tie-breaking every NTILE by the unique custkey makes tier
    assignment deterministic on both engines despite equal scores.

    Scale note: NTILE over the full customer table is a global sort — fine
    here because the windowed relation is the per-customer AGGREGATE
    (customer-count rows, not orders), but at 10⁹ customers the cutoffs
    would come from a hash-sampled quantile estimate broadcast back
    map-side, exactly the `perplexity_bucket` pattern; the census keyed
    on 27 cells is then one tiny hash agg."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("monetary"),
    )
    scored = per_cust.select(
        "o_custkey",
        F.ntile(3).over(
            Window.orderBy(F.col("last_order").desc(), "o_custkey")
        ).alias("r_tier"),
        F.ntile(3).over(
            Window.orderBy(F.col("frequency").desc(), "o_custkey")
        ).alias("f_tier"),
        F.ntile(3).over(
            Window.orderBy(F.col("monetary").desc(), "o_custkey")
        ).alias("m_tier"),
    )
    return scored.groupBy("r_tier", "f_tier", "m_tier").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("o_custkey").alias("example_custkey"),
    )


HIST_WIDTH = 5_000.0  # fixed-width profiling buckets over l_extendedprice
HIST_NBUCKETS = 24  # clamp range [0, 120000); out-of-range rows land in the edges


@register(
    "agg_histogram",
    oracle=f"""
    SELECT bucket,
           bucket * {HIST_WIDTH} AS lo,
           (bucket + 1) * {HIST_WIDTH} AS hi,
           COUNT(*) AS n_items
    FROM (
      SELECT LEAST(GREATEST(CAST(FLOOR(l_extendedprice / {HIST_WIDTH}) AS INTEGER),
                            0), {HIST_NBUCKETS - 1}) AS bucket
      FROM lineitem)
    GROUP BY bucket ORDER BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of ``l_extendedprice`` — the data-profiling
    pass a pipeline runs before choosing filter thresholds or spotting
    drift between ingest batches. Bounds are FIXED constants (clamped to
    edge buckets), not a data-dependent min/max: a two-pass dynamic
    histogram would scan 100 TB twice and make the bucketing
    non-deterministic under late data; profiling jobs pin the range and
    re-pin when the edge buckets grow. Plan: the bucket id is a map-side
    arithmetic projection, then a partial+final hash aggregate over at
    most 24 groups — the shuffle moves 24 rows per task regardless of
    SF. Determinism: floor(double / exact-constant) and integer clamps
    agree across engines; lo/hi are small-int * constant products."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bucket = F.least(
        F.greatest(
            F.floor(F.col("l_extendedprice") / F.lit(HIST_WIDTH)).cast("int"),
            F.lit(0),
        ),
        F.lit(HIST_NBUCKETS - 1),
    ).alias("bucket")
    return (
        li.select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .select(
            "bucket",
            (F.col("bucket") * HIST_WIDTH).alias("lo"),
            ((F.col("bucket") + 1) * HIST_WIDTH).alias("hi"),
            "n_items",
        )
        .orderBy("bucket")
    )


# Minimum co-occurrence count for a part pair to enter the basket report
# (hapax pairs make lift meaningless).
BASKET_MIN_COUNT = 2


@register(
    "orders_market_basket",
    oracle=f"""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lp),
    per_part AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM lp GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= {BASKET_MIN_COUNT}),
    scored AS (
      SELECT p.part_a, p.part_b, p.c_ab, pa.c AS c_a, pb.c AS c_b,
             CAST(p.c_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
               / (CAST(pa.c AS DOUBLE) * CAST(pb.c AS DOUBLE)) AS lift
      FROM pairs p
      JOIN per_part pa ON pa.l_partkey = p.part_a
      JOIN per_part pb ON pb.l_partkey = p.part_b
      CROSS JOIN n)
    SELECT part_a, part_b, c_ab, c_a, c_b, lift
    FROM scored ORDER BY lift DESC, part_a, part_b LIMIT 50
    """,
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: the top-50 part pairs by lift =
    P(a,b)·N / (P(a)·P(b)) over co-occurrence in the same order — the
    classic retail affinity report, and the same counts-plus-one-division
    determinism recipe as `collocation_lift_topk` applied to a
    TRANSACTIONAL self-join instead of a text explode.

    Plan: the corpus pays ONE exchange — a per-order collect_set that
    reduces each basket to its sorted distinct-part array (≤7 elements in
    TPC-H, so state per key is a constant) — and every downstream relation
    derives from that grouped frame: pairs explode MAP-SIDE from the
    sorted array (x<y for free, ≤21 structs per order — a self-join
    formulation would rescan lineitem for each role instead), per-part
    order counts explode the same arrays, and the order total is the
    grouped frame's 1-row count (scalar broadcast). The pair census is
    floored at count ≥ 2 BEFORE the two per-part-count joins (both
    unhinted — the per-part table is SF-proportional, AQE decides), and
    the top-50 is TakeOrderedAndProject with a (part_a, part_b) tiebreak
    — never a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .select("parts")
    )
    n = g.agg(F.count(F.lit(1)).alias("n_orders"))
    per_part = (
        g.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pair_structs = F.expr(
        "flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts)), "
        "y -> struct(x as part_a, y as part_b))))"
    )
    pairs = (
        g.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= BASKET_MIN_COUNT)
    )
    pa = per_part.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a"))
    pb = per_part.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b"))
    scored = (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b", "c_ab", "c_a", "c_b",
            (
                F.col("c_ab").cast("double") * F.col("n_orders").cast("double")
                / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), "part_a", "part_b").limit(50)


@register(
    "orders_cohort_ltv",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey, o_totalprice,
             DATE_TRUNC('month', o_orderdate) AS order_m,
             DATE_TRUNC('month', MIN(o_orderdate)
               OVER (PARTITION BY o_custkey)) AS cohort_m
      FROM orders),
    aged AS (
      SELECT o_custkey, o_totalprice, cohort_m,
             (YEAR(order_m) - YEAR(cohort_m)) * 12
               + (MONTH(order_m) - MONTH(cohort_m)) AS age_months
      FROM base),
    census AS (
      SELECT cohort_m, age_months,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             {sql_dsum('o_totalprice')} AS revenue
      FROM aged GROUP BY cohort_m, age_months),
    actives AS (
      SELECT cohort_m, age_months, CAST(COUNT(*) AS BIGINT) AS n_active
      FROM (SELECT DISTINCT cohort_m, age_months, o_custkey FROM aged)
      GROUP BY cohort_m, age_months)
    SELECT c.cohort_m, c.age_months, c.n_orders, a.n_active, c.revenue,
           c.revenue / CAST(a.n_active AS DOUBLE) AS revenue_per_active
    FROM census c JOIN actives a
      ON a.cohort_m = c.cohort_m AND a.age_months = c.age_months
    ORDER BY c.cohort_m, c.age_months
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value triangle: orders bucketed by the
    customer's first-order month (the acquisition cohort) × months since
    that first order, with order counts, distinct active customers, and
    decimal-exact revenue per cell — the transactional twin of
    `retention_cohorts` and the table every LTV / payback-period model
    reads.

    Plan: ONE customer-keyed window shuffle assigns the cohort month
    (the window MIN needs no ordering — it is the partition MIN, so the
    window state is one date per customer); month age is integer
    year/month arithmetic (no interval semantics to diverge
    cross-engine). The per-customer-cell aggregate then groups by
    (cohort, age, custkey) WITHOUT a new exchange — custkey partitioning
    already co-locates every such group (clustering on a superset of the
    partitioning keys) — and the final (cohort, age) census folds order
    counts, DECIMAL revenue, and the distinct-active count (each
    customer-cell row IS one active customer — the two-level
    dedup-then-count with no Expand and no join) in one more exchange.
    Two exchanges, one scan, zero joins. Revenue is DECIMAL-accumulated
    (operators/exact.py) so cells are bit-stable under AQE
    re-partitioning; the only double division is revenue/n_active."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey")
    aged = o.select(
        "o_custkey",
        "o_totalprice",
        F.trunc(F.col("o_orderdate"), "month").alias("order_m"),
        F.trunc(F.min("o_orderdate").over(w), "month").alias("cohort_m"),
    ).select(
        "o_custkey",
        "o_totalprice",
        "cohort_m",
        (
            (F.year("order_m") - F.year("cohort_m")) * 12
            + (F.month("order_m") - F.month("cohort_m"))
        ).alias("age_months"),
    )
    per_cust_cell = aged.groupBy("cohort_m", "age_months", "o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"),
    )
    return (
        per_cust_cell.groupBy("cohort_m", "age_months")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.count(F.lit(1)).alias("n_active"),
            F.sum("rev_dec").cast("double").alias("revenue"),
        )
        .select(
            "cohort_m",
            "age_months",
            "n_orders",
            "n_active",
            "revenue",
            (F.col("revenue") / F.col("n_active").cast("double")).alias(
                "revenue_per_active"
            ),
        )
        .orderBy("cohort_m", "age_months")
    )


@register(
    "parts_pareto_abc",
    oracle="""
    WITH pp AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS rev_dec
      FROM lineitem GROUP BY l_partkey),
    b AS (
      SELECT (LENGTH(PRINTF('%b',
                GREATEST(1, CAST(FLOOR(rev_dec) AS BIGINT)))) - 1) AS bucket,
             rev_dec
      FROM pp),
    census AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(rev_dec) AS DECIMAL(38,6)) AS brev
      FROM b GROUP BY bucket),
    w AS (
      SELECT bucket, n_parts, brev,
             CAST(SUM(brev) OVER (ORDER BY bucket DESC
                                  ROWS UNBOUNDED PRECEDING)
                  AS DECIMAL(38,6)) AS cum,
             CAST(SUM(brev) OVER () AS DECIMAL(38,6)) AS tot
      FROM census)
    SELECT bucket, n_parts,
           CAST(brev AS DOUBLE) AS bucket_revenue,
           CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share,
           CASE WHEN CAST(cum - brev AS DOUBLE) / CAST(tot AS DOUBLE) < 0.80
                  THEN 'A'
                WHEN CAST(cum - brev AS DOUBLE) / CAST(tot AS DOUBLE) < 0.95
                  THEN 'B'
                ELSE 'C' END AS abc_class
    FROM w ORDER BY bucket DESC
    """,
)
def parts_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC revenue-concentration census over parts: per-part
    discounted revenue, bucketed by floor(log2(revenue)), with the
    cumulative revenue share from the top bucket down and the standard
    warehouse ABC split (A = buckets starting inside the top 80% of
    revenue, B = 80-95%, C = tail) — "which slice of the catalog earns
    the money" for inventory/curation decisions.

    Scale (the part a per-part NTILE/cumsum gets wrong): parts are
    SF-proportional, so ranking every part in one ordered window is a
    global-sort bottleneck at 100 TB. Like `events_user_concentration`,
    the census collapses to log2 REVENUE buckets first (~40 rows at any
    SF — revenue range grows with volume, not row count), and the
    cumulative window runs single-partition over census-sized input,
    computing the running and full-frame totals in one pass. ABC class
    is assigned at bucket granularity — the honest scalable definition
    (a bucket straddling a boundary takes the class of its START share).

    Determinism: per-part revenue is a decimal-exact sum
    (`operators/exact.py`), bucket ids are integer digit-count log2,
    cumulative sums stay DECIMAL inside the window, and each output row
    pays exactly two double divisions."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pp = li.groupBy("l_partkey").agg(F.sum(rev.cast(DEC)).alias("rev_dec"))
    bucket = (
        F.length(
            F.conv(
                F.greatest(
                    F.lit(1).cast("bigint"),
                    F.floor("rev_dec").cast("bigint"),
                ).cast("string"),
                10,
                2,
            )
        )
        - 1
    ).alias("bucket")
    census = pp.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev_dec").cast("decimal(38,6)").alias("brev"),
    )
    w_run = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = F.sum("brev").over(w_run).cast("decimal(38,6)")
    tot = F.sum("brev").over(w_all).cast("decimal(38,6)")
    prev_share = (cum - F.col("brev")).cast("double") / tot.cast("double")
    return (
        census.select(
            "bucket",
            "n_parts",
            F.col("brev").cast("double").alias("bucket_revenue"),
            (cum.cast("double") / tot.cast("double")).alias("cum_share"),
            F.when(prev_share < 0.80, "A")
            .when(prev_share < 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        .orderBy(F.col("bucket").desc())
    )


# ---------------------------------------------------------------------------
# Interval-overlap self-join — the temporal join class (concurrency analysis,
# telemetry overlap, genomics ranges) that join_range's equi+residual shape
# cannot express because NEITHER side has a point key: both sides are
# intervals and the predicate is symmetric overlap.
# ---------------------------------------------------------------------------

IV_BIN_DAYS = 28  # > max synthetic transit duration (27d), so <= 2 bins/interval
_IV_BIN_SECS = IV_BIN_DAYS * 86400


@register(
    "join_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT l_suppkey AS sk,
             l_orderkey * 10 + l_linenumber AS lid,
             l_shipdate AS s,
             l_shipdate + ((l_orderkey * 7 + l_linenumber) % 21 + 7)
                          * INTERVAL 1 DAY AS e
      FROM lineitem)
    SELECT a.sk AS s_suppkey,
           COUNT(*) AS overlap_pairs,
           CAST(SUM(DATE_DIFF('day', GREATEST(a.s, b.s), LEAST(a.e, b.e)))
                AS BIGINT) AS overlap_days
    FROM iv a JOIN iv b
      ON a.sk = b.sk AND a.lid < b.lid AND a.s < b.e AND b.s < a.e
    GROUP BY a.sk
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier in-transit concurrency: each lineitem defines a transit
    interval [shipdate, shipdate + 7..27 days) (duration derived
    deterministically from the line's key, since the fixture has no receipt
    date), and the operator counts, per supplier, the pairs of that
    supplier's shipments whose transit windows overlap, plus the total
    overlapping days.

    Scale plan — binned interval join, NOT a theta join: a raw overlap
    self-join on suppkey alone degenerates at 100 TB (a large supplier's
    group is quadratic: 600k lines/supplier -> 1.8e11 predicate evals).
    Instead each interval explodes to the <= 2 fixed 28-day time bins it
    touches (bin width > max duration bounds the fan-out), the self-join
    runs as an EQUI-join on (suppkey, bin) — shuffle-partitionable, AQE-
    skew-splittable — and each surviving pair is counted exactly once at
    the bin holding the LATER start (which both intervals' bin ranges
    provably cover). The oracle states the declarative truth as the plain
    theta join; the engine plan is the partitioned rewrite of it.

    Binning is Spark-internal (any fixed monotone bucketing yields the same
    final pairs — the oracle has no bins), so session-TZ epoch arithmetic
    is safe here. The epoch seconds are projected ONCE per interval before
    the join (persisted with the exploded bins), so the join residuals —
    including the later-start dedupe — are pure integer comparisons; a
    first draft re-derived ``unix_timestamp(greatest(s1, s2))`` per
    candidate pair and ran ~4× slower. Date math on timestamps survives
    only in the final per-PAIR day count, where the oracle needs it.
    """
    li = load_table(spark, sf_dir, "lineitem")
    iv = li.select(
        F.col("l_suppkey").alias("sk"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("lid"),
        F.col("l_shipdate").alias("s"),
        F.expr(
            "timestampadd(DAY, CAST((l_orderkey * 7 + l_linenumber) % 21 + 7"
            " AS INT), l_shipdate)"
        ).alias("e"),
    ).select(
        "*",
        F.unix_timestamp("s").alias("ss"),
        F.unix_timestamp("e").alias("es"),
    )
    binned = managed_persist(
        iv.select(
            "*",
            F.explode(
                F.sequence(
                    F.expr(f"ss DIV {_IV_BIN_SECS}"),
                    F.expr(f"es DIV {_IV_BIN_SECS}"),
                )
            ).alias("bin"),
        )
    )
    x, y = binned.alias("x"), binned.alias("y")
    pairs = x.join(
        y,
        (F.col("x.sk") == F.col("y.sk"))
        & (F.col("x.bin") == F.col("y.bin"))
        & (F.col("x.lid") < F.col("y.lid"))
        & (F.col("x.ss") < F.col("y.es"))
        & (F.col("y.ss") < F.col("x.es"))
        # dedupe across bins: count the pair only in the later start's bin
        & (F.col("x.bin") == F.expr(f"greatest(x.ss, y.ss) DIV {_IV_BIN_SECS}")),
    )
    return pairs.groupBy(F.col("x.sk").alias("s_suppkey")).agg(
        F.count(F.lit(1)).alias("overlap_pairs"),
        F.sum(
            F.datediff(
                F.to_date(F.least(F.col("x.e"), F.col("y.e"))),
                F.to_date(F.greatest(F.col("x.s"), F.col("y.s"))),
            )
        ).alias("overlap_days"),
    )
