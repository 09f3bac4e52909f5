"""Continuous top-k: the streaming twin of the batch ``topk`` operator —
the one §2.2 batch family that had no streaming counterpart (r8 VERDICT
item 8).

A complete-mode aggregation (per-user event counts) followed by a sort +
limit: Structured Streaming maintains the running counts in the state
store across micro-batches and re-ranks on every trigger, so the sink
always holds the CURRENT top-k — the live-leaderboard shape. The final
table after the bounded run equals the batch ranking over all data, which
is exactly the oracle.

Ties on the count are broken by ``user_id`` on both sides so the limit
boundary is deterministic.

Reference: the reference (lib/nats.js) streams messages but computes no
rankings; this is engine-added capability, same family as the batch
``topk``/``topk_per_group`` (operators/relational.py).

Scale notes: complete mode re-emits the full ranked result per trigger —
correct here because the result is K rows, tiny by construction (the
aggregation state is per-user counts, which shard across the cluster;
only the post-agg K-row sort is global, and Spark plans it as
TakeOrderedAndProject). At 100 TB the same plan holds: state scales with
distinct keys, output stays K rows. For an unbounded deployment where
even per-key state must be bounded, swap the groupBy for a windowed
aggregation with a watermark and rank within closed windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from .source import read_events_stream, run_to_memory

K = 25


@register(
    "stream_topk",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n
    FROM events
    GROUP BY user_id
    ORDER BY n DESC, user_id
    LIMIT {K}
    """,
)
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running top-{K} users by event count, complete output mode. The
    emitted table is a pure function of all data seen so far, so trigger
    phasing cannot affect the final result (pinned 1-vs-4 by
    tests/test_trigger_phasing.py); ingest everything in one data trigger
    for the bounded fixture run."""
    src = read_events_stream(spark, sf_dir, files_per_trigger=4)
    ranked = (
        src.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(K)
    )
    return run_to_memory(ranked, "complete")
