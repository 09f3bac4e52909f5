"""Structured Streaming layer: the reference's unbounded-stream semantics
(SURVEY.md §2.1 S1/S4/S5/S7) plus the streaming capabilities the reference
lacks entirely (watermarks, event-time windows, stateful dedup) — SURVEY.md
§2.2 rows `stream_*`.

Batch twins of the CDC surface live in ``operators/cdc.py``; this package
holds the genuinely streaming execution paths. Every operator here still
satisfies the driver contract — ``(spark, sf_dir) -> DataFrame`` — by
running a real StreamingQuery (file source staged from the fixture →
micro-batches → memory sink) to completion and returning the sink table, so
results stay collectable AND oracle-checkable.
"""

from . import (  # noqa: F401
    ab_lift,
    anomaly,
    asof,
    bounded,
    cdc_diff,
    errors,
    funnel,
    ingest_dedup,
    joins,
    ohlc,
    retention,
    rpc,
    source,
    topk,
    upsert,
    windows,
)
