"""Stream-stream correlation join — the join-based twin of the RPC
operator (SURVEY.md §2.1 S7: `lib/nats.js:196-256` maps to a stream-stream
join on correlation key with a time-range residual; `streaming/rpc.py`
implements the stateful-timer variant, this module the join variant).

Semantics chosen to be oracle-exact: with time-ordered micro-batches, a
30-minute watermark, and a 2-hour join horizon, no boundary-crossing match
is ever (a) dropped late — batch k+1's rows all sit above the watermark
computed from batch k — or (b) state-evicted early — a click is evicted
only once the watermark passes click_ts + horizon, by which time every
matching purchase has already arrived. The streaming inner join therefore
equals the plain relational join, and the DuckDB oracle is that join.

Scale: both streams shuffle once on the correlation key (user_id); join
state per key is bounded by the horizon (watermark eviction drops a row
the moment it can no longer match), so state size tracks horizon × rate,
not stream length — the property that keeps this runnable forever.

Trigger sizing (r8): the bounded fixture runs ingest 2 staged files per
trigger — each trigger pays a fixed machinery cost (~0.66 s measured,
see streaming/rpc.py's profile), and the join semantics are
batch-phasing-independent: inner matches are found whenever both sides
have arrived, and outer nulls are only KEPT below the conservative
cutoff (final watermark − horizon − 1 h slack) where emission is
unambiguous at any trigger count; the final no-data batch always evicts
and flushes whatever remains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from .source import final_watermark, read_events_stream, run_to_memory

_DELAY = "30 minutes"
_HORIZON_SQL = "INTERVAL 2 HOUR"


def _ntz(col: str):
    return F.col(col).cast("timestamp_ntz").alias(col)


@register(
    "stream_stream_join",
    oracle=f"""
    SELECT r.event_id AS click_id,
           s.event_id AS purchase_id,
           r.user_id,
           CAST(r.ts AS TIMESTAMP) AS click_ts,
           CAST(s.ts AS TIMESTAMP) AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') r
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') s
      ON r.user_id = s.user_id
     AND s.ts > r.ts
     AND s.ts <= r.ts + {_HORIZON_SQL}
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlate each click with the purchases the same user makes within
    the next 2 hours — requests joined to responses on (key, time-range),
    the reference's RPC correlation expressed as Structured Streaming's
    stream-stream inner join with watermark-bounded state."""
    clicks = (
        read_events_stream(spark, sf_dir, files_per_trigger=4)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", _DELAY)
    )
    purchases = (
        read_events_stream(spark, sf_dir, files_per_trigger=4)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", _DELAY)
    )
    joined = clicks.join(
        purchases,
        (F.col("r_user") == F.col("s_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 2 HOURS")),
    ).select(
        "click_id",
        "purchase_id",
        F.col("r_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
    )
    return run_to_memory(joined, "append").select(
        F.col("click_id"),
        F.col("purchase_id"),
        F.col("user_id"),
        _ntz("click_ts"),
        _ntz("purchase_ts"),
    )


@register(
    "stream_stream_left_join",
    oracle=f"""
    WITH c AS (SELECT event_id AS click_id, user_id,
                      CAST(ts AS TIMESTAMP) AS click_ts
               FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id,
                 CAST(ts AS TIMESTAMP) AS purchase_ts
          FROM events WHERE event_type = 'purchase'),
    m AS (SELECT c.click_id, p.purchase_id, c.user_id, c.click_ts, p.purchase_ts
          FROM c JOIN p ON c.user_id = p.user_id
                       AND p.purchase_ts > c.click_ts
                       AND p.purchase_ts <= c.click_ts + {_HORIZON_SQL})
    SELECT click_id, purchase_id, user_id, click_ts, purchase_ts FROM m
    UNION ALL
    SELECT c.click_id, CAST(NULL AS BIGINT), c.user_id, c.click_ts,
           CAST(NULL AS TIMESTAMP)
    FROM c
    WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.click_id = c.click_id)
      -- Spark's global watermark under the default 'min' policy is the
      -- LEAST of the per-stream watermarks (each stream's max ts - delay);
      -- the cutoff is that watermark minus the 2h join horizon + 1h slack.
      AND c.click_ts < (SELECT LEAST((SELECT MAX(click_ts) FROM c),
                                     (SELECT MAX(purchase_ts) FROM p))
                          - INTERVAL 210 MINUTE)
    """,
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RPC-timeout analog in join form (SURVEY §2.1 S7's alternative
    implementation): clicks LEFT-joined to purchases — a matched row per
    response, and a null row (the 408) once the watermark proves no
    response can arrive. Null emission at the exact watermark boundary
    depends on micro-batch phasing (eviction lags the late-filter by one
    batch), so the op finalizes CONSERVATIVELY: null rows are kept only
    below a horizon one hour older than the theoretical eviction point
    (final watermark - join horizon - 1h slack), where emission is
    unambiguous — the same slack reasoning a production pipeline applies
    before acting on timeout records. The horizon comes from the
    query's OWN final event-time watermark (``lastProgress``), the
    streaming-native signal — no batch rescan of the source, which on a
    real unbounded stream would not even be defined. The oracle mirrors
    the horizon exactly (watermark = max ts - 30min delay, so the cutoff
    is max ts - 210min); matched rows are always complete (verified:
    inner-join results equal the batch join at every boundary)."""
    clicks = (
        read_events_stream(spark, sf_dir, files_per_trigger=4)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", _DELAY)
    )
    purchases = (
        read_events_stream(spark, sf_dir, files_per_trigger=4)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", _DELAY)
    )
    joined = clicks.join(
        purchases,
        (F.col("r_user") == F.col("s_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 2 HOURS")),
        "left_outer",
    ).select(
        "click_id",
        "purchase_id",
        F.col("r_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
    )
    out, query = run_to_memory(joined, "append", with_query=True)
    import datetime

    horizon = final_watermark(query) - datetime.timedelta(hours=3)
    return out.filter(
        F.col("purchase_id").isNotNull() | (F.col("click_ts") < F.lit(horizon))
    ).select(
        F.col("click_id"),
        F.col("purchase_id"),
        F.col("user_id"),
        _ntz("click_ts"),
        _ntz("purchase_ts"),
    )
