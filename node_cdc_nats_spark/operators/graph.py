"""Graph analytics over the part co-purchase graph (lineitem-derived).

The reference engine has no graph layer (its surface is a 256-line NATS
pub/sub client, ``lib/nats.js``); these operators cover the graph-shaped
workloads a 100 TB curation pipeline runs on entity/co-occurrence graphs —
link-based importance scoring (PageRank over a co-purchase graph here; over
a doc-citation or domain-link graph in a web corpus) expressed as Spark
joins + aggregations, one shuffle per superstep, exactly the Pregel cost
model.

Determinism (the driver hash-checks values): cross-row float summation is
order-dependent, so each PageRank superstep quantizes every edge
contribution ``r(u)/outdeg(u)`` to integer picounits (floor at 1e12) BEFORE
the cross-row sum — the same make-the-iteration-integer trick that made the
learned-IVF Lloyd rounds oracle-checkable (operators/similarity.py). The
quantization is the operator's contract and the DuckDB oracle applies the
identical floor, so Spark and the oracle agree bit-for-bit after any number
of supersteps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..cache import managed_persist
from ..io import load_table
from ..registry import register

PR_DAMPING = 0.85
PR_ITERS = 3
PR_TOPN = 20
# Contribution quantum: r/outdeg values live in (0, 1]; floored picounits
# keep >= 12 significant digits per contribution while any realistic
# in-degree sum stays far below int64 range (1e12 * degree << 9.2e18).
PR_QUANTUM = 1e12


def _sql_pr_step(i: int) -> str:
    """One unrolled PageRank superstep as a DuckDB CTE: rank mass flows
    ``src -> dst`` over the co-purchase edges, each contribution floored to
    integer picounits before the cross-row sum (order-independent), then the
    damped update. Every co-purchase node has in-edges (the edge set is
    symmetric by construction), so grouping by ``dst`` re-covers the full
    node set each step."""
    return f"""
    r{i} AS (
      SELECT ed.dst AS node,
             CAST(0.15 AS DOUBLE) / MAX(n.n)
             + CAST({PR_DAMPING} AS DOUBLE)
               * (CAST(SUM(CAST(FLOOR((p.r / ed.outdeg) * {PR_QUANTUM:.1f})
                                AS BIGINT)) AS DOUBLE) / {PR_QUANTUM:.1f}) AS r
      FROM ed JOIN r{i - 1} p ON p.node = ed.src CROSS JOIN n
      GROUP BY ed.dst)"""


@register(
    "graph_pagerank",
    oracle=f"""
    WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    e AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
          FROM it a JOIN it b ON a.ok = b.ok AND a.pk <> b.pk),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
    ed AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN deg d USING (src)),
    r0 AS (SELECT deg.src AS node, CAST(1 AS DOUBLE) / n.n AS r FROM deg, n),
    {",".join(_sql_pr_step(i).strip() for i in range(1, PR_ITERS + 1))}
    SELECT node AS part_key, r AS pagerank
    FROM (SELECT node, r,
                 ROW_NUMBER() OVER (ORDER BY r DESC, node) AS rn
          FROM r{PR_ITERS})
    WHERE rn <= {PR_TOPN}
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph: nodes are parts, with a
    (symmetric, unweighted) edge between two parts whenever some order
    contains both; {PR_ITERS} damped supersteps from a uniform start, top
    {PR_TOPN} parts by final rank.

    Scale plan: each superstep is ONE shuffle — an equi-join of the edge
    list with the current rank vector on ``src`` followed by a partial+final
    integer SUM keyed on ``dst`` (map-side combine applies because the
    quantized contributions are BIGINTs). The edge list (with out-degrees
    pre-attached) is built once and persisted across the {PR_ITERS}
    supersteps; nothing ever materializes driver-side except the 1-row node
    count. Skewed hub parts are ordinary AQE skew-join territory. At 100 TB
    the superstep count is the knob; the per-step cost stays
    |edges|-linear.

    Determinism: contributions are floored to integer picounits before the
    cross-row sum (see module docstring); the quantization is mirrored in
    the oracle, so the iterated doubles are bit-identical cross-engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    it = li.select("l_orderkey", "l_partkey").distinct()
    a, b = it.alias("a"), it.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # src, dst, outdeg — reused by all supersteps, so persist once.
    ed = managed_persist(e.join(deg, "src"))
    n = ed.agg(F.countDistinct("src")).collect()[0][0]  # 1-row fetch
    if not n:
        # No order carries two distinct parts: an empty graph is a
        # well-typed empty leaderboard, not a division by zero.
        return spark.createDataFrame([], "part_key bigint, pagerank double")
    ranks = ed.select("src").distinct().select(
        F.col("src").alias("node"), (F.lit(1.0) / F.lit(float(n))).alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = ed.join(ranks, ed.src == ranks.node).select(
            "dst",
            F.floor((F.col("r") / F.col("outdeg")) * F.lit(PR_QUANTUM)).alias("q"),
        )
        ranks = contrib.groupBy("dst").agg(F.sum("q").alias("sq")).select(
            F.col("dst").alias("node"),
            (
                F.lit(0.15) / F.lit(float(n))
                + F.lit(PR_DAMPING) * (F.col("sq").cast("double") / F.lit(PR_QUANTUM))
            ).alias("r"),
        )
    return (
        ranks.orderBy(F.col("r").desc(), "node")
        .limit(PR_TOPN)
        .select(F.col("node").alias("part_key"), F.col("r").alias("pagerank"))
    )
