#!/usr/bin/env python
"""Streaming-CDC walkthrough: the continuous consumer-side pipeline the
reference's push delivery implies (`/root/reference/lib/nats.js:86-113`
hands every envelope to its subscribers the moment it arrives) — run
end-to-end on the engine's streaming twins, each stage a registered
operator with a batch counterpart and a DuckDB oracle:

1. `stream_upsert`       — the live per-key LATEST table (foreachBatch merge)
2. `stream_cdc_column_diff` — which payload columns each update touched,
                           emitted once per version at watermark-crossing
3. `stream_downsample_ohlc` — the hourly OHLC metrics rollup, one emission
                           per bucket when the watermark closes it
4. `stream_join_asof_nearest` — each click's nearest same-user purchase
                           within ±10 min, decided at the tolerance horizon

Run: python examples/streaming_cdc.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict[str, int]:
    from pyspark.sql import functions as F

    from node_cdc_nats_spark.session import get_spark
    from node_cdc_nats_spark.streaming.asof import stream_join_asof_nearest
    from node_cdc_nats_spark.streaming.cdc_diff import stream_cdc_column_diff
    from node_cdc_nats_spark.streaming.ohlc import stream_downsample_ohlc
    from node_cdc_nats_spark.streaming.upsert import stream_upsert

    spark = get_spark(app_name="streaming_cdc_example", shuffle_partitions=8)

    # The maintained latest-state table (== batch cdc_upsert_latest).
    latest = stream_upsert(spark, sf_dir)
    # Column-level change feed: one report per version the watermark
    # reached; first version per user is the insert.
    diffs = stream_cdc_column_diff(spark, sf_dir)
    # Metrics rollup: one OHLC row per closed (event_type, hour) bucket.
    ohlc = stream_downsample_ohlc(spark, sf_dir)
    # Correlation: nearest purchase per click within the ±10 min contract.
    nearest = stream_join_asof_nearest(spark, sf_dir)

    return {
        "latest_rows": latest.count(),
        "diff_decided": diffs.count(),
        "diff_inserts": diffs.filter(F.col("op") == "I").count(),
        "ohlc_buckets": ohlc.count(),
        "nearest_decided": nearest.count(),
        "nearest_matched": nearest.filter(F.col("direction").isNotNull()).count(),
    }


if __name__ == "__main__":
    out = main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    for k, v in out.items():
        print(f"{k:>16}: {v}")
