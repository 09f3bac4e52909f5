"""Continuous experiment monitor — the streaming twin of
``events_ab_lift`` (operators/analytics.py): the A/B conversion-lift
report maintained incrementally as the event stream drains, decision-ready
at any trigger.

Why this one is PURE built-in streaming (no custom state fn): the per-user
conversion flag is ``MAX(high-value-purchase)`` — a monotone streaming
aggregate Spark's state store implements natively. Variant assignment is a
deterministic md5 bucket of the user id (stateless). So the whole
incremental layer is one update-mode ``groupBy(user_id).max()``; the sink
accumulates per-user emissions and the registered query folds them with
the IDENTICAL census + lift/z-score tree the batch operator uses
(``ab_lift_report`` — shared code, so the twins cannot drift), making the
oracle the batch operator's verbatim.

Equivalence has no watermark caveat: there is no event-time logic at all —
the flag is monotone under ANY arrival order, so the per-user MAX over
update-mode emissions equals the batch answer over all data regardless of
replay disorder or trigger phasing (pinned in tests/test_trigger_phasing.py
and the timeline test).

Scale: state is ONE integer per experiment user in the state store
(RocksDB-backed on a production cluster) — bounded by the experiment
population, not stream length or event volume; each trigger's update is a
partial+final MAX keyed on user_id, the same single corpus-sized exchange
as the batch plan, applied only to the trigger's increment. A production
monitor reads the same report every trigger instead of at the end.

Reference: the reference client (lib/nats.js) delivers events and leaves
analysis to the consumer; this is engine-added capability in the event
analytics family (SURVEY §2.2), sharing ``events_ab_lift``'s exact
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.analytics import AB_LIFT_ORACLE, ab_lift_report
from ..registry import register
from .source import read_events_stream, run_to_memory


@register("stream_ab_lift", oracle=AB_LIFT_ORACLE)
def stream_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``events_ab_lift`` (module docstring): update-mode
    per-user conversion flags from a native streaming MAX, folded by the
    batch operator's own report tree; the flag's monotonicity makes the
    result independent of arrival order and trigger phasing."""
    src = read_events_stream(spark, sf_dir, files_per_trigger=4)
    cv_updates = src.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 200),
                1,
            ).otherwise(0)
        ).alias("cv")
    )
    sink = run_to_memory(cv_updates, "update")
    # A user re-emits whenever a trigger touches them; the flag is
    # monotone, so MAX over emissions == the batch flag over all data.
    per = sink.groupBy("user_id").agg(F.max("cv").alias("cv"))
    return ab_lift_report(per)
