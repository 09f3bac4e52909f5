#!/usr/bin/env python
"""Training-corpus curation walkthrough: the LLM-pipeline operators
composed the way a data team would actually run them — quality gate →
exact dedup → near-dup pair review → benchmark decontamination →
train/val split — over the `documents` fixture, each stage a registered
engine operator (the fused single-plan variant is `pipeline_end_to_end`).

Run: python examples/corpus_pipeline.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict[str, int]:
    from node_cdc_nats_spark.operators.dedup import dedup_exact, dedup_minhash
    from node_cdc_nats_spark.operators.pipeline import (
        bpe_pair_stats,
        decontaminate_containment,
        decontaminate_ngram,
        perplexity_bucket,
        pipeline_end_to_end,
        quality_filter_gopher,
        train_val_split,
    )
    from node_cdc_nats_spark.session import get_spark

    spark = get_spark(app_name="corpus_pipeline_example", shuffle_partitions=8)
    # Each stage below runs INDEPENDENTLY over the same raw fixture — a
    # tour of the individual operators with their standalone outputs. The
    # actually-chained gate→dedup→decontaminate→split (each stage feeding
    # the next, fused into ONE logical plan with two corpus shuffles) is
    # the last entry, `pipeline_end_to_end` — that is the shape you deploy.
    stages = {
        # Gopher-style quality gate (length/repetition/symbol ratios).
        "gated_docs": quality_filter_gopher(spark, sf_dir).count(),
        # Exact dedup: content-hash groups (linear hash-groupBy; in a real
        # run this goes before the banded pass so byte-identical clusters
        # never reach it — pipeline_end_to_end orders it that way).
        "content_hash_groups": dedup_exact(spark, sf_dir).count(),
        # Near-dup pair review: MinHash-banded candidates, Jaccard-verified.
        "near_dup_pairs": dedup_minhash(spark, sf_dir).count(),
        # 13-gram benchmark decontamination (broadcast containment join).
        "clean_docs": decontaminate_ngram(spark, sf_dir).count(),
        # Pairwise overlap-fraction report (which benchmark leaked where).
        "containment_pairs": decontaminate_containment(spark, sf_dir).count(),
        # CCNet-style quality terciles from hash-sampled surprisal cutoffs.
        "ppl_bucketed_docs": perplexity_bucket(spark, sf_dir).count(),
        # Tokenizer induction: top BPE first-merge candidates.
        "bpe_merge_candidates": bpe_pair_stats(spark, sf_dir).count(),
        # Deterministic hash split (no global sort, no RNG state).
        "train_val_rows": train_val_split(spark, sf_dir).count(),
        # The composed flagship: the four stages above as one fused plan.
        "fused_pipeline_rows": pipeline_end_to_end(spark, sf_dir).count(),
    }
    # r6 corpus-observability additions — the reports a data team reads
    # BEFORE re-running the gate/dedup/split stages above.
    from node_cdc_nats_spark.operators.pipeline import (
        collocation_lift_topk,
        ngram_novelty_curve,
        seq_len_histogram,
    )
    from node_cdc_nats_spark.operators.text import lang_confusion_matrix

    # log2 token-length census + padding waste (sizes pack_sequences).
    stages["seq_len_buckets"] = seq_len_histogram(spark, sf_dir).count()
    # PMI-family collocations as pure count ratios (tokenizer-merge cues).
    stages["top_collocations"] = collocation_lift_topk(spark, sf_dir).count()
    # Crawl-tag vs heuristic language agreement (off-diagonal = mislabels).
    stages["lang_confusion_cells"] = lang_confusion_matrix(spark, sf_dir).count()
    # Per-ingest-batch trigram novelty decay (source saturation curve).
    stages["novelty_batches"] = ngram_novelty_curve(spark, sf_dir).count()
    return stages


if __name__ == "__main__":
    out = main(*sys.argv[1:2])
    for stage, n in out.items():
        print(f"{stage:22s} {n}")
