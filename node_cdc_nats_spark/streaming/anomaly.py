"""Continuous data-quality monitor — the streaming twin of
``events_anomaly_zscore`` (operators/analytics.py): the per-type 3σ
outlier flags maintained incrementally as the event stream drains,
decision-ready at any trigger.

Why this one is PURE built-in streaming (no custom state fn): the
per-type population moments ``(count, Σx, Σx²)`` are ADDITIVE — each is a
native streaming SUM/COUNT aggregate whose state-store value simply
accumulates every trigger's partial. So the whole incremental layer is
one update-mode ``groupBy(event_type).agg(count, sum, sum)``; the sink
accumulates per-type emissions, the fold picks each type's LAST emission
(the one carrying the largest ``n`` — the running count is strictly
monotone, so "latest" needs no wall-clock), and the registered query
closes with the batch operator's own shared expression tree
(``anomaly_moments``' DECIMAL accumulation inside the stream,
``zscore_flags``' mean/variance/z tail — shared code, so the twins cannot
drift), making the oracle the batch operator's verbatim.

Equivalence has no watermark caveat: there is no event-time logic at all —
DECIMAL sums are exact and order-independent and the count is arrival-
order-blind, so the final cumulative emission per type equals the batch
moments bit-for-bit under ANY replay disorder or trigger phasing (pinned
in tests/test_streaming_twins_timelines.py and tests/test_trigger_phasing.py).

Scale: state is THREE scalars per event type in the state store
(RocksDB-backed on a production cluster) — bounded by the type vocabulary,
never by stream length or event volume; each trigger's update is a
partial+final aggregation over the trigger's increment only, the same
tiny-key-space exchange as the batch plan. The z-flag tail re-scores the
corpus against the current moments — the "re-score so far" a quality
monitor publishes per trigger; at end of drain that is exactly the batch
answer.

Reference: the reference client (lib/nats.js) delivers events and leaves
analysis to the consumer; this is engine-added capability in the event
analytics family (SURVEY §2.2), sharing ``events_anomaly_zscore``'s exact
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..operators.analytics import ANOMALY_ZSCORE_ORACLE, zscore_flags
from ..operators.exact import DEC
from ..registry import register
from .source import read_events_stream, run_to_memory


@register("stream_anomaly_zscore", oracle=ANOMALY_ZSCORE_ORACLE)
def stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``events_anomaly_zscore`` (module docstring):
    update-mode per-type moment sums from native streaming COUNT/SUM
    (DECIMAL-accumulated inside the state store — exact, order-blind),
    folded by the strictly-monotone running count and closed with the
    batch operator's shared ``zscore_flags`` tree."""
    src = read_events_stream(spark, sf_dir, files_per_trigger=4)
    x = F.col("value")
    # The streaming half of anomaly_moments: identical DECIMAL
    # accumulation, but the double cast waits for the fold — the state
    # store carries exact decimals across triggers.
    moment_updates = src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(DEC)).alias("sx"),
        F.sum((x * x).cast("decimal(30,4)")).alias("sxx"),
    )
    sink = run_to_memory(moment_updates, "update")
    # A type re-emits its CUMULATIVE moments whenever a trigger touches
    # it; n strictly increases per emission, so max_by(n) is each type's
    # final (= whole-stream) moment vector — bit-equal to the batch sums
    # because DECIMAL addition is exact and associative.
    final = sink.groupBy("event_type").agg(
        F.max_by(F.struct("n", "sx", "sxx"), "n").alias("s")
    )
    stats = final.select(
        "event_type",
        F.col("s.n").cast("double").alias("n"),
        F.col("s.sx").cast("double").alias("sx"),
        F.col("s.sxx").cast("double").alias("sxx"),
    )
    return zscore_flags(load_table(spark, sf_dir, "events"), stats)
