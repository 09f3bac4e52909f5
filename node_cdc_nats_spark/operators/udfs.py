"""User-defined function surface — SURVEY.md §2.2 row "UDF/UDAF/UDTF".

The reference's only extension points are the per-subscription ``callback``
(`lib/nats.js:109-111`) and the RPC ``resProcess`` transform
(`lib/nats.js:218-222`) — arbitrary user JS over single messages. The
engine's equivalents are Arrow-vectorized, not per-row:

- ``udf_scalar``: `pandas_udf` scalar — the batch-columnar replacement for
  a per-message callback. JVM→Arrow→numpy→Arrow→JVM, one transfer per
  batch, no Python call per row.
- ``udf_grouped``: `applyInPandas` — per-group user logic (the shape every
  "custom operator" takes when built-ins run out; embed_knn uses the same
  machinery).
- ``udf_grouped_agg``: grouped-aggregate `pandas_udf` usable inside
  ``groupBy().agg(...)`` alongside built-ins.
- ``udtf_tokens``: a Python UDTF (table function) — one row in, N rows out.

Determinism rules (everything must hash-match DuckDB): per-row float
arithmetic only (no float reductions in Python except over integers);
group statistics via order-independent min/max or integer-cent sums.

All UDF bodies are self-contained closures — executor workers do not have
this repo on sys.path (driver contract), so nothing may reference module
globals.
"""

from __future__ import annotations

import pandas as pd  # module-level so grouped-agg UDF type hints resolve

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..registry import register


@register(
    "udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           CASE WHEN l_discount >= 0.05 THEN 'deep'
                WHEN l_discount > 0.0 THEN 'shallow'
                ELSE 'none' END AS discount_tier
    FROM lineitem
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf: per-line charge + discount tier. The
    arithmetic is per-row double math (deterministic on any engine); numpy
    evaluates it across the whole Arrow batch at once."""

    @F.pandas_udf("double")
    def charge(price, discount, tax):
        return price * (1.0 - discount) * (1.0 + tax)

    @F.pandas_udf("string")
    def tier(discount):
        import numpy as np
        import pandas as pd

        return pd.Series(
            np.where(discount >= 0.05, "deep", np.where(discount > 0.0, "shallow", "none"))
        )

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
        tier("l_discount").alias("discount_tier"),
    )


@register(
    "udf_grouped",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CASE WHEN mx = mn THEN 0.5
                ELSE (o_totalprice - mn) / (mx - mn) END AS price_scaled
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             MIN(o_totalprice) OVER (PARTITION BY o_custkey) AS mn,
             MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS mx
      FROM orders)
    """,
)
def udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas min-max scaling of each customer's order totals,
    SHARDED: grouping directly by o_custkey makes one Arrow slice per
    customer (~15k tiny groups at sf0.1 — per-group Python overhead was
    30% of the whole bench). Instead the shuffle key is a 64-way shard of
    the customer key; every customer still lands wholly inside one shard,
    and the per-customer min/max runs vectorized inside the shard via
    pandas groupby.transform. Same semantics, ~64 Arrow batches instead of
    ~15k — the same sharding pattern as streaming/rpc.py state keying."""

    def scale_shard(pdf):
        g = pdf.groupby("o_custkey")["o_totalprice"]
        mn, mx = g.transform("min"), g.transform("max")
        rng = mx - mn
        scaled = ((pdf["o_totalprice"] - mn) / rng).where(rng != 0.0, 0.5)
        return pdf[["o_custkey", "o_orderkey"]].assign(price_scaled=scaled)

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("shard", F.pmod(F.col("o_custkey"), F.lit(64)))
        .groupBy("shard")
        .applyInPandas(
            scale_shard, schema="o_custkey bigint, o_orderkey bigint, price_scaled double"
        )
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_suppkey,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
    FROM lineitem GROUP BY l_suppkey
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf inside groupBy().agg(): exact revenue
    per supplier by summing integer cents (associative, so partial
    aggregation order is irrelevant — same trick as operators/exact.py, in
    user code)."""

    @F.pandas_udf("double")
    def cents_sum(price: pd.Series) -> float:  # Series->scalar = grouped agg
        return float((price * 100).round().astype("int64").sum()) / 100.0

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(cents_sum("l_extendedprice").alias("revenue"))


@register(
    "udtf_tokens",
    oracle="""
    SELECT doc_id,
           CAST(pos AS INT) AS pos,
           tok
    FROM (
      SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok,
             UNNEST(RANGE(LEN(STRING_SPLIT(LOWER(text), ' ')))) AS pos
      FROM documents)
    WHERE tok <> ''
    """,
)
def udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one document row in, one row per token out (position +
    token), skipping empties — the table-function shape of a tokenizer.
    Registered per-call and applied via lateral join so the scan stays
    columnar up to the UDTF boundary. Arrow-optimized (``useArrow=True``):
    input rows cross to Python in Arrow batches (ArrowEvalPythonUDTF in
    the plan) instead of pickled one at a time — the declaration-level
    flag works on a vanilla driver session where a session conf would
    not."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string", useArrow=True)
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for pos, tok in enumerate((text or "").lower().split(" ")):
                if tok:
                    yield pos, tok

    docs = load_table(spark, sf_dir, "documents")
    spark.udtf.register("tokenize", Tokenize)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.tok
        FROM _udtf_docs d, LATERAL tokenize(d.doc_id, d.text) t
        """
    )
