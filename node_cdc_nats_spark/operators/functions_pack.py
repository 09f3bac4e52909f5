"""Scalar function packs: string / date / math / array / JSON
(SURVEY.md §2.2 "String functions" … "JSON functions").

Reference analog: the reference's only scalar work is subject/channel string
handling and JSON payloads (``contentType: "json"``,
``/root/reference/examples/cdc-pub.js:34,39``). All expressions here are
built-in ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd; no
Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..registry import register


@register(
    "array_ops",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS INT) AS dim,
           embedding[1] AS e_first,
           embedding[64] AS e_last,
           LIST_MIN(embedding) AS e_min,
           LIST_MAX(embedding) AS e_max,
           CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INT) AS n_pos,
           ARRAY_TO_STRING(LIST_TRANSFORM(embedding[1:3],
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), ',') AS head3
    FROM embeddings
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # head3 is emitted as a comma-joined string (not a raw array column):
    # the driver's canonicalizer sorts result cells and crashes on
    # unhashable list cells. Elements render as integer micros
    # (floor(x*1e6)) — float64 multiply + floor are IEEE-identical on both
    # engines, so the strings agree bit-for-bit with no format/rounding-mode
    # dependence.
    em = load_table(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("e_first"),
        F.element_at("embedding", 64).alias("e_last"),
        F.array_min("embedding").alias("e_min"),
        F.array_max("embedding").alias("e_max"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 3),
                lambda x: F.floor(x.cast("double") * 1000000).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("head3"),
    )


@register(
    "str_ops",
    oracle="""
    SELECT c_custkey,
           UPPER(c_mktsegment) AS seg_upper,
           LOWER(c_name) AS name_lower,
           SUBSTRING(c_name, 10, 9) AS digits,
           LENGTH(c_name) AS name_len,
           CONCAT_WS('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS tagged,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS extracted,
           REPLACE(c_name, 'Customer#', 'C') AS short_name,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           TRIM(CONCAT('  ', c_mktsegment, ' ')) AS trimmed
    FROM customer
    """,
)
def str_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 10, 9).alias("digits"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias("tagged"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("extracted"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C")).alias("short_name"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
    )


@register(
    "date_ops",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
           CAST(EXTRACT(day FROM o_orderdate) AS INT) AS o_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_95,
           CAST(o_orderdate AS DATE) AS o_date,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
)
def date_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("o_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz"))
        .cast("int")
        .alias("days_since_95"),
        F.col("o_orderdate").cast("date").alias("o_date"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    )


@register(
    "math_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_disc,
           CAST(FLOOR(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
           CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_ceil_k,
           SQRT(l_extendedprice) AS price_sqrt,
           l_quantity * l_quantity AS qty_sq,
           CAST(l_linenumber % 3 AS INT) AS line_mod,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           GREATEST(l_tax, l_discount) AS max_rate,
           LEAST(l_tax, l_discount) AS min_rate
    FROM lineitem
    """,
)
def math_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.floor(F.col("l_quantity") / 7.0).alias("qty_bucket"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_ceil_k"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_linenumber") % 3).cast("int").alias("line_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) % 10 AS k_mod,
           JSON_EXTRACT_STRING(props, '$.missing') AS missing
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_mod"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@register(
    "json_schema_projection",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    WHERE CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) > 50
    GROUP BY event_type
    """,
)
def json_schema_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # from_json with an explicit schema: the schema-on-read path the CDC
    # payload decoder uses (contentType='json' payloads, SURVEY.md §1.2).
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k INT"))
    return (
        parsed.filter(F.col("p.k") > 50)
        .groupBy("event_type")
        .agg(F.sum(F.col("p.k").cast("long")).alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "map_ops",
    oracle="""
    SELECT event_id,
           'k,m' AS key_csv,
           CONCAT(CAST(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS VARCHAR), ',',
                  CAST(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) % 10 AS VARCHAR)) AS val_csv,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_lookup,
           2 AS map_size,
           'k,m,z' AS merged_keys
    FROM events
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column functions (SURVEY §2.2 array/map row): build a map
    from scalars, then map_keys / map_values / element lookup / size /
    map_concat — all rendered to hashable scalar columns (raw map cells,
    like arrays, crash the driver canonicalizer). The oracle mirrors the
    rendered values: DuckDB needs no map type to verify the semantics.
    Map construction + extraction stay map-side (no shuffle)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    m = F.create_map(
        F.lit("k"), k,
        F.lit("m"), k % 10,
    )
    merged = F.map_concat(m, F.create_map(F.lit("z"), F.lit(0)))
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("key_csv"),
        F.array_join(F.transform(F.map_values(m), lambda v: v.cast("string")), ",").alias(
            "val_csv"
        ),
        F.element_at(m, F.lit("k")).alias("k_lookup"),
        F.size(m).alias("map_size"),
        F.array_join(F.map_keys(merged), ",").alias("merged_keys"),
    )
