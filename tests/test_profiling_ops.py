"""Semantic tests for the profiling/telemetry ops (`agg_histogram`,
`source_dup_rate`): invariants the oracle diff can't state (totals
conserve row counts, rates stay in range, clamping owns the tails).
"""

from __future__ import annotations

import duckdb

from node_cdc_nats_spark import registry
from node_cdc_nats_spark.operators.relational import HIST_NBUCKETS, HIST_WIDTH

from .conftest import SF_DIR

registry.load_all()


def test_histogram_conserves_rows_and_clamps(spark):
    rows = registry.QUERIES["agg_histogram"](spark, SF_DIR).collect()
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchone()[0]
    assert sum(r["n_items"] for r in rows) == total  # every row lands somewhere
    for r in rows:
        assert 0 <= r["bucket"] < HIST_NBUCKETS
        assert r["lo"] == r["bucket"] * HIST_WIDTH
        assert r["hi"] == r["lo"] + HIST_WIDTH
        assert r["n_items"] > 0  # empty buckets are absent, not zero-rows


def test_source_dup_rate_bounds_and_identity(spark):
    rows = registry.QUERIES["source_dup_rate"](spark, SF_DIR).collect()
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        assert 1 <= r["n_unique"] <= r["n_docs"]
        assert 0.0 <= r["dup_rate"] < 1.0
        # the rate is exactly the integers' ratio, not an approximation
        assert r["dup_rate"] == (r["n_docs"] - r["n_unique"]) / r["n_docs"]
