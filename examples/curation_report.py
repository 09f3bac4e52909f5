#!/usr/bin/env python
"""Curation-report walkthrough (r7 operators): the three questions a
training-data curator asks before cutting a new corpus snapshot —
*which documents lean toward the target domain* (DSIR importance votes),
*which slice of the catalog carries the value* (Pareto/ABC revenue
concentration, the same census pattern applied to any "value per key"
column), and *how engaged the event-producing population is*
(weekly DAU/WAU stickiness). Every stage is a registered,
oracle-verified engine operator.

Run: python examples/curation_report.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict[str, int]:
    from node_cdc_nats_spark.operators.analytics import (
        events_weekly_stickiness,
    )
    from node_cdc_nats_spark.operators.pipeline import dsir_importance_weights
    from node_cdc_nats_spark.operators.relational import parts_pareto_abc
    from node_cdc_nats_spark.session import get_spark

    spark = get_spark(app_name="curation_report_example", shuffle_partitions=8)
    from pyspark.sql import functions as F

    report = {
        # DSIR importance vote: documents whose hashed-unigram vocabulary
        # leans toward the target (reference-language) distribution.
        "dsir_keep": dsir_importance_weights(spark, sf_dir)
        .filter(F.col("keep"))
        .count(),
        # Pareto/ABC: how many log2 revenue buckets the catalog spans,
        # and how many parts sit in the A (top-80%-of-revenue) buckets.
        "abc_buckets": parts_pareto_abc(spark, sf_dir).count(),
        "abc_a_parts": parts_pareto_abc(spark, sf_dir)
        .filter(F.col("abc_class") == "A")
        .agg(F.coalesce(F.sum("n_parts"), F.lit(0)))
        .collect()[0][0],
        # Engagement: weeks observed and peak stickiness (avg-DAU/WAU),
        # reported in integer permille so the pin stays exact.
        "weeks": events_weekly_stickiness(spark, sf_dir).count(),
        "peak_stickiness_permille": events_weekly_stickiness(spark, sf_dir)
        .agg(F.floor(F.max("stickiness") * 1000).cast("int"))
        .collect()[0][0],
    }
    return {k: int(v) for k, v in report.items()}


if __name__ == "__main__":
    out = main(*sys.argv[1:2])
    for k, v in out.items():
        print(f"{k}: {v}")
