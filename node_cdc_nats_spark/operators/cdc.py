"""CDC envelope operators — the reference's own capability surface,
re-expressed relationally over the ``events`` table (batch analog of the
CDC stream; streaming twins live in ``node_cdc_nats_spark.streaming``).

Mapping to the reference (SURVEY.md §2.1):
- ``filter_channel``   ← MQTT pattern gate, ``lib/nats.js:94-96`` (S3)
- ``fanout_dispatch``  ← multicast to all matching subs, ``lib/nats.js:86-113`` (S4)
- ``bounded_subscription`` ← inclusive ``max`` delivery, ``lib/nats.js:97-107`` (S5)
- ``cdc_upsert_latest`` / ``cdc_changelog`` ← the queryable view of a CDC
  history the reference only transports
- ``rpc_first_response`` ← request/response correlation with first-wins and
  408 timeout, ``lib/nats.js:196-256`` (S7)

The synthetic ``channel`` column (``cdc/<event_type>/<user_id % 10>``)
stands in for ``CDCMsg.channel``; at scale it is a codegen'd projection, and
every pattern filter on it is an ordinary Catalyst predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.mqtt import channel_matches, mqtt_to_regex
from ..io import load_table
from ..registry import register

# Logical subscriptions used by the fan-out / bounded-delivery fixtures.
# (sub_id, mqtt_pattern, max_deliveries)
SUBSCRIPTIONS = [
    ("s1", "cdc/click/#", 2000000000),
    ("s2", "cdc/+/3", 500),
    ("s3", "cdc/error/5", 100),
]

_CHANNEL_SQL = "CONCAT('cdc/', event_type, '/', CAST(user_id % 10 AS VARCHAR))"


def with_channel(events: DataFrame) -> DataFrame:
    """Attach the synthetic CDCMsg.channel column."""
    return events.withColumn(
        "channel",
        F.concat(F.lit("cdc/"), F.col("event_type"), F.lit("/"), (F.col("user_id") % 10).cast("string")),
    )


def _subs_sql_values() -> str:
    rows = ", ".join(
        f"('{sid}', '{mqtt_to_regex(pat)}', {mx})" for sid, pat, mx in SUBSCRIPTIONS
    )
    return f"(VALUES {rows}) AS s(sub_id, pattern_re, max_n)"


def dispatch_subs(e: DataFrame) -> DataFrame:
    """Multicast dispatch: one (sub_id, event) row per subscription whose
    MQTT pattern matches the event's channel. The subscription registry is
    driver-side and tiny, so each pattern embeds as a LITERAL regex —
    compiled once inside codegen — and the multicast is a map-side
    explode of the matched-sub array over a single scan. (A broadcast
    theta-join with a pattern COLUMN is the same plan shape but recompiles
    the regex per row: Spark's RLike caches only the last pattern, and the
    per-row sub cycle defeats that cache — measured ~4× slower.)"""
    matched = F.array_compact(
        F.array(*[
            F.when(F.col("channel").rlike(mqtt_to_regex(pat)), F.lit(sid))
            for sid, pat, _ in SUBSCRIPTIONS
        ])
    )
    return e.select(
        F.explode(matched).alias("sub_id"), *e.columns
    )


@register(
    "filter_channel",
    oracle=f"""
    SELECT event_id, channel FROM (
      SELECT event_id, {_CHANNEL_SQL} AS channel FROM events) t
    WHERE REGEXP_MATCHES(channel, '{mqtt_to_regex("cdc/+/7")}')
    """,
)
def filter_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = with_channel(load_table(spark, sf_dir, "events"))
    return e.filter(channel_matches("channel", "cdc/+/7")).select("event_id", "channel")


@register(
    "channel_params",
    oracle=f"""
    SELECT event_id, channel,
           REGEXP_EXTRACT(channel, '^cdc/([^/]+)(?:/(.*))?$', 1) AS etype,
           REGEXP_EXTRACT(channel, '^cdc/([^/]+)(?:/(.*))?$', 2) AS rest
    FROM (SELECT event_id, {_CHANNEL_SQL} AS channel FROM events) t
    WHERE REGEXP_MATCHES(channel, '^cdc/[^/]+(/.*)?$')
    """,
)
def channel_params_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter extraction from the channel path — the
    `mqtt-pattern` dep's extract surface (`+name`/`#name` captures,
    package.json:11 of the reference) as a vectorized regexp projection.
    The `#rest` capture is an array<string> in the API
    (functions/mqtt.py:channel_params); it is re-joined to a string here
    because the driver's canonicalizer needs hashable cells — same
    convention as array_ops."""
    from ..functions.mqtt import channel_params

    e = with_channel(load_table(spark, sf_dir, "events"))
    params = channel_params(F.col("channel"), "cdc/+etype/#rest")
    return (
        e.filter(channel_matches("channel", "cdc/+/#"))
        .select(
            "event_id",
            "channel",
            params["etype"].alias("etype"),
            F.array_join(params["rest"], "/").alias("rest"),
        )
    )


@register(
    "fanout_dispatch",
    oracle=f"""
    SELECT s.sub_id, e.event_id, e.channel
    FROM (SELECT event_id, {_CHANNEL_SQL} AS channel FROM events) e
    JOIN {_subs_sql_values()}
      ON REGEXP_MATCHES(e.channel, s.pattern_re)
    """,
)
def fanout_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shared scan, N pattern subscriptions — the reference's multicast
    # loop (lib/nats.js:92-112) as a map-side literal-regex dispatch (see
    # dispatch_subs): the subscription registry is tiny and driver-known,
    # the event stream is the 100 TB side, and no shuffle or join appears
    # anywhere in the plan.
    e = with_channel(load_table(spark, sf_dir, "events")).select(
        "event_id", "channel"
    )
    return dispatch_subs(e).select("sub_id", "event_id", "channel")


@register(
    "bounded_subscription",
    oracle=f"""
    WITH dispatched AS (
      SELECT s.sub_id, s.max_n, e.event_id, e.ts,
             ROW_NUMBER() OVER (PARTITION BY s.sub_id ORDER BY e.ts, e.event_id) AS rn
      FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, {_CHANNEL_SQL} AS channel
            FROM events) e
      JOIN {_subs_sql_values()}
        ON REGEXP_MATCHES(e.channel, s.pattern_re))
    SELECT sub_id, event_id, CAST(rn AS BIGINT) AS delivery_no
    FROM dispatched WHERE rn <= max_n
    """,
)
def bounded_subscription(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Inclusive `max` semantics of lib/nats.js:99-107: the row where the
    # counter reaches max IS delivered, everything after is dropped.
    e = with_channel(load_table(spark, sf_dir, "events")).select(
        "event_id", "ts", "channel"
    )
    max_n = F.coalesce(
        *[
            F.when(F.col("sub_id") == sid, F.lit(mx))
            for sid, _, mx in SUBSCRIPTIONS
        ]
    )
    w = W.partitionBy("sub_id").orderBy("ts", "event_id")
    return (
        dispatch_subs(e)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_n)
        .select("sub_id", "event_id", F.col("rn").cast("long").alias("delivery_no"))
    )


@register(
    "cdc_upsert_latest",
    oracle="""
    SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
    FROM (
      SELECT user_id, event_id, event_type, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def cdc_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-key latest state of the CDC history (the materialized "table view"
    # of the stream the reference transports). At scale: one shuffle by key;
    # AQE handles skewed hot keys.
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value", "ts")
    )


@register(
    "cdc_changelog",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN LAG(event_id) OVER w IS NULL THEN 'I' ELSE 'U' END AS op,
           value,
           LAG(value) OVER w AS prev_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Changelog view: first row per key is an insert, later rows are updates
    # carrying the previous value (what a MERGE INTO sink would consume).
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.when(F.lag("event_id").over(w).isNull(), "I").otherwise("U").alias("op"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
    )


@register(
    "rpc_first_response",
    oracle="""
    WITH req AS (
      SELECT event_id AS req_id, user_id, CAST(ts AS TIMESTAMP) AS req_ts
      FROM events WHERE event_type = 'click'),
    resp AS (
      SELECT event_id AS resp_id, user_id, CAST(ts AS TIMESTAMP) AS resp_ts
      FROM events WHERE event_type IN ('purchase', 'signup')),
    matched AS (
      SELECT r.req_id, p.resp_id, p.resp_ts,
             ROW_NUMBER() OVER (PARTITION BY r.req_id
                                ORDER BY p.resp_ts, p.resp_id) AS rn
      FROM req r JOIN resp p
        ON p.user_id = r.user_id
       AND p.resp_ts >= r.req_ts
       AND p.resp_ts <= r.req_ts + INTERVAL 10 MINUTE)
    SELECT q.req_id, m.resp_id,
           CAST(CASE WHEN m.resp_id IS NULL THEN 408 ELSE 200 END AS INT) AS code
    FROM req q LEFT JOIN (SELECT req_id, resp_id FROM matched WHERE rn = 1) m
      USING (req_id)
    """,
)
def rpc_first_response(spark: SparkSession, sf_dir: str, res_process=None) -> DataFrame:
    """Batch analog of the reference RPC (lib/nats.js:196-256): requests race
    responses on N subjects; the FIRST response within the timeout wins
    (lib/nats.js:215-225); requests with none resolve {code: 408}
    (lib/nats.js:238-247). 'click' events act as requests; 'purchase'/'signup'
    are the two response subjects (their union mirrors the multi-subject
    subscribe); correlation key is user_id, timeout 10 minutes.

    ``res_process`` is the reference's winner-transform hook
    (``options.resProcess``, lib/nats.js:218-222): a callable applied to the
    winning-response DataFrame (req_id, resp_id, resp_value) BEFORE the
    outcome joins back to its request — extra columns it adds ride through
    to the result (null for 408 rows, exactly like the reference, where
    resProcess never runs on a timeout)."""
    e = load_table(spark, sf_dir, "events")
    req = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("req_id"), "user_id", F.col("ts").alias("req_ts")
    )
    resp = e.filter(F.col("event_type").isin("purchase", "signup")).select(
        F.col("event_id").alias("resp_id"),
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("resp_ts"),
        F.col("value").alias("resp_value"),
    )
    # Equi-join on the correlation key carries the shuffle; the time-range
    # residual bounds state — the same plan the streaming twin uses with a
    # watermark (streaming/rpc.py).
    joined = req.join(
        resp,
        (resp.r_user_id == req.user_id)
        & (resp.resp_ts >= req.req_ts)
        & (resp.resp_ts <= F.col("req_ts") + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    )
    winners = (
        joined.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("req_id").orderBy("resp_ts", "resp_id")),
        )
        .filter(F.col("rn") == 1)
        .select("req_id", "resp_id", "resp_value")
    )
    if res_process is not None:
        winners = res_process(winners)
    extra = [c for c in winners.columns if c not in ("req_id", "resp_id", "resp_value")]
    return (
        req.join(winners.drop("resp_value"), "req_id", "left")
        .select(
            "req_id",
            "resp_id",
            F.when(F.col("resp_id").isNull(), 408).otherwise(200).cast("int").alias("code"),
            *extra,
        )
    )


@register(
    "rpc_first_response_processed",
    oracle="""
    WITH req AS (
      SELECT event_id AS req_id, user_id, CAST(ts AS TIMESTAMP) AS req_ts
      FROM events WHERE event_type = 'click'),
    resp AS (
      SELECT event_id AS resp_id, user_id, CAST(ts AS TIMESTAMP) AS resp_ts,
             value AS resp_value
      FROM events WHERE event_type IN ('purchase', 'signup')),
    matched AS (
      SELECT r.req_id, p.resp_id, p.resp_value,
             ROW_NUMBER() OVER (PARTITION BY r.req_id
                                ORDER BY p.resp_ts, p.resp_id) AS rn
      FROM req r JOIN resp p
        ON p.user_id = r.user_id
       AND p.resp_ts >= r.req_ts
       AND p.resp_ts <= r.req_ts + INTERVAL 10 MINUTE)
    SELECT q.req_id, m.resp_id,
           CAST(CASE WHEN m.resp_id IS NULL THEN 408 ELSE 200 END AS INT) AS code,
           m.resp_value * 2.0 AS result
    FROM req q
    LEFT JOIN (SELECT req_id, resp_id, resp_value FROM matched WHERE rn = 1) m
      USING (req_id)
    """,
)
def rpc_first_response_processed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rpc_first_response`` with a resProcess winner-transform installed
    (the reference's lib/nats.js:218-222 hook): the winning response's
    payload is doubled into a ``result`` column before resolution; 408 rows
    never ran the hook, so their result is null."""

    def double_payload(winners: DataFrame) -> DataFrame:
        return winners.withColumn("result", F.col("resp_value") * 2.0)

    return rpc_first_response(spark, sf_dir, res_process=double_payload)


@register(
    "cdc_scd2",
    oracle="""
    SELECT user_id, event_id, value,
           CAST(ts AS TIMESTAMP) AS valid_from,
           CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS TIMESTAMP) AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM events
    WHERE event_type = 'signup' OR event_type = 'purchase'
    """,
)
def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension from the change stream: each change
    row becomes a versioned interval [valid_from, valid_to), open-ended for
    the current version — the standard CDC materialization for historical
    joins (the reference's transport layer feeds exactly this pattern;
    cf. cdc_upsert_latest for the type-1 twin, `operators/cdc.py`).

    Plan: one window over the per-key shuffle — same single-shuffle shape
    as cdc_upsert_latest; at 100 TB the partition key (user) distributes
    evenly and no global sort exists."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "downsample_ohlc",
    oracle="""
    WITH b AS (
      SELECT event_type, DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS bucket,
             value, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type, DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))
                                ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY event_type, DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events)
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS vsum
    FROM b GROUP BY event_type, bucket
    """,
)
def downsample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsample: per (event_type, hour) bucket the
    open/high/low/close of `value` plus count and exact sum — the rollup a
    CDC metrics archive materializes so dashboards never rescan raw
    events. Open/close are (ts, event_id)-tiebroken row_numbers (min_by/
    arg_min are tie-nondeterministic in both engines); high/low/count are
    plain aggregates; the sum accumulates in DECIMAL for a bit-stable
    cross-engine hash.

    Plan: ONE shuffle — the window partitions by (event_type, bucket) and
    the following groupBy uses the same keys, so Catalyst reuses the
    window's hashpartitioning for the final aggregate. At 100 TB the
    bucket count grows with the time span, not the event count, and each
    window partition holds one bucket's events."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("bucket")
    base = e.select("event_type", bucket, "value", "ts", "event_id")
    wo = W.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wc = W.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    staged = base.withColumn("rn_open", F.row_number().over(wo)).withColumn(
        "rn_close", F.row_number().over(wc)
    )
    return staged.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("vsum"),
    )


@register(
    "cdc_column_diff",
    oracle="""
    WITH v AS (
      SELECT event_id, user_id, event_type, value, props,
             LAG(event_id) OVER w AS p_id,
             LAG(event_type) OVER w AS p_type,
             LAG(value) OVER w AS p_value,
             LAG(props) OVER w AS p_props
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id,
           CASE WHEN p_id IS NULL THEN 'I' ELSE 'U' END AS op,
           CASE WHEN p_id IS NULL THEN NULL ELSE CONCAT_WS(',',
             CASE WHEN p_type IS DISTINCT FROM event_type
                  THEN 'event_type' END,
             CASE WHEN p_value IS DISTINCT FROM value THEN 'value' END,
             CASE WHEN p_props IS DISTINCT FROM props THEN 'props' END)
           END AS changed_cols,
           CAST(CASE WHEN p_id IS NULL THEN 0 ELSE
             (CASE WHEN p_type IS DISTINCT FROM event_type
                   THEN 1 ELSE 0 END)
             + (CASE WHEN p_value IS DISTINCT FROM value THEN 1 ELSE 0 END)
             + (CASE WHEN p_props IS DISTINCT FROM props THEN 1 ELSE 0 END)
           END AS INT) AS n_changed,
           CASE WHEN p_id IS NULL THEN NULL
                ELSE value - p_value END AS value_delta
    FROM v
    """,
)
def cdc_column_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level change report over the per-key version history — the
    Debezium-style "which fields did this update touch" view downstream
    column-routing / audit consumers build from a CDC feed (the
    reference transports the envelopes, lib/nats.js:86-113; this is the
    queryable diff of what they carried). First row per key is the
    insert ('I'); each later version ('U') reports the null-safe set of
    changed payload columns as a fixed-order CSV string, the changed
    count, and the numeric delta for the measure column.

    Plan: ONE user_id window shuffle carries all four LAGs (same
    exchange as `cdc_changelog` — the diff is a map-side projection on
    top); no joins, no second pass. Determinism: the (ts, event_id)
    ordering is total, comparisons are null-safe (`IS DISTINCT FROM` /
    `eqNullSafe`), and the column list renders in a fixed order."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    p_id = F.lag("event_id").over(w)
    p_type = F.lag("event_type").over(w)
    p_value = F.lag("value").over(w)
    p_props = F.lag("props").over(w)
    changed_type = ~p_type.eqNullSafe(F.col("event_type"))
    changed_value = ~p_value.eqNullSafe(F.col("value"))
    changed_props = ~p_props.eqNullSafe(F.col("props"))
    is_insert = p_id.isNull()
    changed_cols = F.concat_ws(
        ",",
        F.when(changed_type, "event_type"),
        F.when(changed_value, "value"),
        F.when(changed_props, "props"),
    )
    n_changed = (
        changed_type.cast("int")
        + changed_value.cast("int")
        + changed_props.cast("int")
    )
    return e.select(
        "event_id",
        "user_id",
        F.when(is_insert, "I").otherwise("U").alias("op"),
        F.when(is_insert, F.lit(None).cast("string"))
        .otherwise(changed_cols)
        .alias("changed_cols"),
        F.when(is_insert, F.lit(0)).otherwise(n_changed).cast("int").alias("n_changed"),
        F.when(is_insert, F.lit(None).cast("double"))
        .otherwise(F.col("value") - p_value)
        .alias("value_delta"),
    )
