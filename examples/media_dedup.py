#!/usr/bin/env python
"""Media-dedup walkthrough (r10-r12 operators): the three-tier near-dup
ladder a 100 TB multimodal corpus runs over its opaque binary payloads —
byte-exact first (md5 digests, the cheapest and strictest tier), then
single-asset perceptual (60-bit dHash over the stubbed decode grid: a
re-encode changes every byte but not the decoded order, so the banded
pair-of-bands plan catches what md5 cannot), then frame-sampled VIDEO
near-dup (>=2 sampled-frame fingerprint matches, cross-position, so
re-encoded/re-ordered clips pair). Every stage is a registered,
oracle-verified engine operator; payloads never shuffle in any tier —
only digests/fingerprints + ids leave the scan.

Run: python examples/media_dedup.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict[str, int]:
    from node_cdc_nats_spark.operators.multimodal import (
        multimodal_dedup,
        multimodal_dedup_perceptual,
        multimodal_dedup_video,
        multimodal_frame_sample,
        multimodal_meta,
    )
    from node_cdc_nats_spark.session import get_spark

    spark = get_spark(app_name="media_dedup_example", shuffle_partitions=8)
    from pyspark.sql import functions as F

    stages = {
        # Tier 0 — inventory: every payload with size + mime metadata.
        "media_assets": multimodal_meta(spark, sf_dir).count(),
        # Tier 1 — byte-exact: distinct payloads owning >1 copy (md5
        # digest-only shuffle; the linear pass that owns identical floods).
        "byte_exact_groups": multimodal_dedup(spark, sf_dir)
        .filter(F.col("n_copies") > 1).count(),
        # Tier 2 — perceptual: near-dup asset pairs within Hamming<=4 of
        # the 60-bit dHash (pair-of-bands banding, pigeonhole-exact).
        "perceptual_pairs": multimodal_dedup_perceptual(spark, sf_dir).count(),
        # Tier 3 — video: sampled frames per asset, then clip pairs with
        # >=2 frame fingerprints within Hamming<=4 (cross-position).
        "sampled_frames": multimodal_frame_sample(spark, sf_dir).count(),
        "video_pairs": multimodal_dedup_video(spark, sf_dir).count(),
    }
    for k, v in stages.items():
        print(f"{k:>20}: {v}")
    return stages


if __name__ == "__main__":
    main(*sys.argv[1:2])
