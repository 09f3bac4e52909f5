#!/usr/bin/env python
"""Event-analytics walkthrough: the consumer-side analyses an event
pipeline grows once the CDC stream lands — sessionization → funnel →
cohort retention — over the `events` fixture, each stage a registered
engine operator (`operators/analytics.py`). The reference client
(`/root/reference/lib/nats.js`) delivers events and leaves all of this
to the consumer; these are the queries that consumer runs.

Run: python examples/event_analytics.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict[str, int]:
    from node_cdc_nats_spark.operators.analytics import (
        events_hourly_cusum,
        events_inactivity_churn,
        events_transition_matrix,
        events_user_concentration,
        events_weekly_stickiness,
        funnel_conversion,
        funnel_latency_stats,
        retention_cohorts,
        rolling_active_users,
        sessionize_events,
    )
    from node_cdc_nats_spark.operators.asof import join_asof_nearest
    from node_cdc_nats_spark.operators.cdc import cdc_column_diff
    from node_cdc_nats_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="event_analytics_example", shuffle_partitions=8)
    # 30-min-gap sessions per user: one user_id shuffle end-to-end.
    sessions = sessionize_events(spark, sf_dir)
    # Ordered signup -> click -> purchase funnel: one census row.
    funnel = funnel_conversion(spark, sf_dir).collect()[0]
    # Weekly cohort retention matrix (Monday-anchored calendar weeks).
    cohorts = retention_cohorts(spark, sf_dir)
    # First-order Markov next-event census (same user_id shuffle spec).
    transitions = events_transition_matrix(spark, sf_dir)
    # Trailing-7-day distinct actives (calendar-grid broadcast join).
    actives = rolling_active_users(spark, sf_dir)
    # Signup->first-purchase latency per signup-week cohort (r6).
    latency = funnel_latency_stats(spark, sf_dir)
    # CUSUM drift over the dense hourly type-rate grid (r6).
    cusum = events_hourly_cusum(spark, sf_dir)
    # Lorenz activity-concentration census — the power curve that sizes
    # per-user state and salting thresholds (r6).
    concentration = events_user_concentration(spark, sf_dir)
    # Weekly inactivity-churn census against the observation horizon (r6).
    churn = events_inactivity_churn(spark, sf_dir)
    # DAU/WAU engagement stickiness per Monday-anchored week (r7).
    stickiness = events_weekly_stickiness(spark, sf_dir)
    # Nearest purchase around each click, either direction, ties backward
    # (r7) — the attribution join behind "which purchase did this click
    # relate to".
    nearest = join_asof_nearest(spark, sf_dir)
    # Debezium-style column-level change report per update (r7).
    diffs = cdc_column_diff(spark, sf_dir)
    return {
        "sessions": sessions.count(),
        "n_signup": funnel.n_signup,
        "n_click_after_signup": funnel.n_click_after_signup,
        "n_purchase_after_click": funnel.n_purchase_after_click,
        "cohort_cells": cohorts.count(),
        "transition_pairs": transitions.count(),
        "active_days": actives.count(),
        "latency_cohorts": latency.count(),
        "cusum_rows": cusum.count(),
        "activity_levels": concentration.count(),
        "churn_weeks": churn.count(),
        "stickiness_weeks": stickiness.count(),
        "nearest_forward": nearest.filter(
            F.col("direction") == "forward"
        ).count(),
        "type_change_updates": diffs.filter(
            (F.col("op") == "U")
            & F.col("changed_cols").contains("event_type")
        ).count(),
    }


if __name__ == "__main__":
    out = main(*sys.argv[1:2])
    for stage, n in out.items():
        print(f"{stage:24s} {n}")
