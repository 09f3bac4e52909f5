"""Event-time windowed aggregation, watermark late-data semantics, and
stateful streaming dedup — SURVEY.md §2.2 rows ``stream_watermark``,
``stream_tumble``, ``stream_slide``, ``stream_session``, ``stream_dedup``.

The reference has no time axis at all (SURVEY.md §1.4); these are the
capabilities a CDC stream needs to be *queryable* as it flows. Each op runs
a real StreamingQuery over the staged micro-batch source and returns the
memory-sink table, so the driver can hash it against a DuckDB oracle that
replays the same watermark arithmetic in SQL.

Emission rule used by every append-mode oracle: a window/session is emitted
iff its end <= final watermark (max event time - delay); later windows stay
open in state and never reach the sink. Late-data rule (scatter fixture): a
row of micro-batch k is dropped iff its window end <= the watermark in
force during batch k, which is max(event time over batches < k) - delay.

Scale: tumbling/sliding aggregation state is one row per (window, key) and
is evicted at eviction time — state size is bounded by windows-in-flight ×
key cardinality regardless of stream length. Sliding windows multiply input
by window/slide (4× here) BEFORE the shuffle; at 100 TB prefer tumbling
pre-aggregation + window composition when the slide ratio is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.exact import dsum, sql_dsum
from ..registry import register
from .source import read_events_stream, run_to_memory, sql_final_watermark

DELAY = "30 minutes"
_DELAY_SQL = "INTERVAL 30 MINUTE"


def _ntz(col: str):
    # Output event-time bounds as TIMESTAMP_NTZ so results are
    # session-timezone-independent (matches the batch layer's convention).
    return F.col(col).cast("timestamp_ntz").alias(col)


@register(
    "stream_tumble",
    oracle=f"""
    SELECT CAST(time_bucket({_DELAY_SQL} * 2, CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS ws,
           CAST(time_bucket({_DELAY_SQL} * 2, CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS TIMESTAMP) AS we,
           event_type,
           COUNT(*) AS n,
           {sql_dsum("value")} AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    HAVING we <= {sql_final_watermark(_DELAY_SQL)}
    """,
)
def stream_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type, append mode: only
    watermark-finalized windows emit — the oracle's HAVING replays that."""
    # 2 staged files per trigger: pure cost lever (~0.66 s fixed per
    # trigger); result-set identity under 1-vs-2 phasing is pinned by
    # tests/test_trigger_phasing.py.
    src = read_events_stream(spark, sf_dir, files_per_trigger=4)
    agg = (
        src.withWatermark("ts", DELAY)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    )
    out = agg.select(
        F.col("win.start").alias("ws"),
        F.col("win.end").alias("we"),
        "event_type",
        "n",
        "sum_value",
    )
    return run_to_memory(out, "append").select(
        _ntz("ws"), _ntz("we"), F.col("event_type"), F.col("n"), F.col("sum_value")
    )


@register(
    "stream_slide",
    oracle=f"""
    WITH offs AS (SELECT UNNEST(RANGE(4)) AS k),
    slid AS (
      SELECT CAST(time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
                  - k * INTERVAL 15 MINUTE AS TIMESTAMP) AS ws,
             event_type, value
      FROM events CROSS JOIN offs)
    SELECT ws, CAST(ws + INTERVAL 1 HOUR AS TIMESTAMP) AS we, event_type,
           COUNT(*) AS n
    FROM slid
    GROUP BY 1, 2, 3
    HAVING we <= {sql_final_watermark(_DELAY_SQL)}
    """,
)
def stream_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 15 minutes (each event lands in 4
    windows), append mode with the same finalization rule."""
    # 2 staged files per trigger: pure cost lever (~0.66 s fixed per
    # trigger); result-set identity under 1-vs-2 phasing is pinned by
    # tests/test_trigger_phasing.py.
    src = read_events_stream(spark, sf_dir, files_per_trigger=4)
    agg = (
        src.withWatermark("ts", DELAY)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = agg.select(
        F.col("win.start").alias("ws"), F.col("win.end").alias("we"), "event_type", "n"
    )
    return run_to_memory(out, "append").select(
        _ntz("ws"), _ntz("we"), F.col("event_type"), F.col("n")
    )


@register(
    "stream_session",
    oracle=f"""
    WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > {_DELAY_SQL} THEN 1 ELSE 0 END AS brk
      FROM x),
    numbered AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS ws,
           CAST(MAX(ts) + {_DELAY_SQL} AS TIMESTAMP) AS we,
           COUNT(*) AS n
    FROM numbered
    GROUP BY user_id, sid
    HAVING we <= {sql_final_watermark(_DELAY_SQL)}
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user: Spark merges sessions in
    the state store as batches arrive; the oracle rebuilds them with
    gaps-and-islands SQL. A session closes (and emits) once the watermark
    passes last-event-time + gap."""
    # 2 staged files per trigger: pure cost lever (~0.66 s fixed per
    # trigger); result-set identity under 1-vs-2 phasing is pinned by
    # tests/test_trigger_phasing.py.
    src = read_events_stream(spark, sf_dir, files_per_trigger=4)
    agg = (
        src.withWatermark("ts", DELAY)
        .groupBy(F.session_window("ts", DELAY).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = agg.select(
        "user_id", F.col("win.start").alias("ws"), F.col("win.end").alias("we"), "n"
    )
    return run_to_memory(out, "append").select(
        F.col("user_id"), _ntz("ws"), _ntz("we"), F.col("n")
    )


@register(
    "stream_watermark",
    oracle=f"""
    WITH b AS (
      SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             event_id % 4 AS batch,
             CAST(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
                  + INTERVAL 1 HOUR AS TIMESTAMP) AS we
      FROM events),
    wm AS (  -- Spark's LATE-ROW FILTER lags eviction by one batch: batch k
             -- filters with the watermark computed after batch k-2 (the
             -- value planned into batch k-1), while EVICTION uses the
             -- fresher post-k-1 value — verified empirically, see module
             -- docstring
      SELECT batch,
             MAX(mx) OVER (ORDER BY batch
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
               - {_DELAY_SQL} AS w
      FROM (SELECT batch, MAX(ts) AS mx FROM b GROUP BY batch)),
    kept AS (
      SELECT b.* FROM b JOIN wm USING (batch)
      WHERE wm.w IS NULL OR b.we > wm.w)
    SELECT CAST(we - INTERVAL 1 HOUR AS TIMESTAMP) AS ws, we, event_type,
           COUNT(*) AS n
    FROM kept
    GROUP BY 1, 2, 3
    HAVING we <= {sql_final_watermark(_DELAY_SQL)}
    """,
)
def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data drop semantics, observable: the scatter-staged source makes
    every micro-batch span the whole time range, so after batch 0 the
    watermark sits near the stream's max and most of batches 1..3 arrives
    too late for already-finalized windows. The oracle replays the exact
    per-batch watermark arithmetic (batch = event_id % 4) and keeps a row
    iff its window was still open when its batch ran."""
    src = read_events_stream(spark, sf_dir, order="scatter")
    agg = (
        src.withWatermark("ts", DELAY)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = agg.select(
        F.col("win.start").alias("ws"), F.col("win.end").alias("we"), "event_type", "n"
    )
    return run_to_memory(out, "append").select(
        _ntz("ws"), _ntz("we"), F.col("event_type"), F.col("n")
    )


@register(
    "stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type): first arrival per
    key passes, the rest are suppressed across micro-batches. Only the keys
    are emitted (which row wins within a micro-batch is partition-order
    dependent — the key set is the deterministic contract). At 100 TB use
    ``dropDuplicatesWithinWatermark`` so state is evicted instead of
    unbounded; the fixture's unbounded variant keeps the oracle exact."""
    # 2 staged files per trigger: pure cost lever (~0.66 s fixed per
    # trigger); result-set identity under 1-vs-2 phasing is pinned by
    # tests/test_trigger_phasing.py.
    src = read_events_stream(spark, sf_dir, files_per_trigger=4)
    deduped = src.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return run_to_memory(deduped, "append")
