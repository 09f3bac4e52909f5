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


def _write_documents(tmp_path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dsir_votes_follow_a_real_domain_signal(spark, tmp_path):
    """Hand-built corpus WITH a target-domain vocabulary signal (the
    driver fixture has none — its token distribution is language-
    independent, which is why the vote hovers near zero there): en docs
    use {alpha, beta}, fr docs use {gamma, delta} (md5 3-nibble buckets
    2c1/987/05b/63b — no collisions). Every en token-bucket satisfies
    c_tgt = c_raw, so (c_tgt+1)*n_raw > (c_raw+1)*n_tgt exactly when
    n_raw > n_tgt -> lean +1; every fr bucket has c_tgt = 0 and leans
    -1. So DSIR must keep precisely the en docs, with mean_vote = +/-1."""
    d = _write_documents(
        tmp_path,
        [
            (1, "alpha beta alpha beta", "en", "s"),
            (2, "beta alpha beta alpha", "en", "s"),
            (3, "alpha alpha beta beta", "en", "s"),
            (4, "gamma delta gamma delta", "fr", "s"),
            (5, "delta gamma delta gamma", "fr", "s"),
            (6, "gamma gamma delta delta", "fr", "s"),
        ],
    )
    rows = {
        r["doc_id"]: (r["n_tokens"], r["vote_score"], r["mean_vote"], r["keep"])
        for r in registry.QUERIES["dsir_importance_weights"](spark, d).collect()
    }
    assert rows == {
        1: (4, 4, 1.0, True),
        2: (4, 4, 1.0, True),
        3: (4, 4, 1.0, True),
        4: (4, -4, -1.0, False),
        5: (4, -4, -1.0, False),
        6: (4, -4, -1.0, False),
    }


def test_pareto_abc_bucket_shares(spark, tmp_path):
    """Hand-built revenues hitting all three classes (total 92): one
    part at 64 (bucket 6), two at 8 (bucket 3), two at 4 (bucket 2),
    four at 1 (bucket 0). A class is decided by the share where the
    bucket STARTS: bucket 6 starts at 0% -> A, bucket 3 at 64/92 =
    69.6% -> A, bucket 2 at 80/92 = 87.0% -> B, bucket 0 at 88/92 =
    95.7% -> C."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # lineitem with exact integer revenues: price p, discount 0.
    rows = [
        (1, 64.0), (2, 8.0), (3, 8.0), (4, 4.0), (5, 4.0),
        (6, 1.0), (7, 1.0), (8, 1.0), (9, 1.0),
    ]
    table = pa.table(
        {
            "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
            "l_discount": pa.array([0.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(table, str(tmp_path / "lineitem.parquet"))
    got = [
        (r["bucket"], r["n_parts"], r["bucket_revenue"], r["abc_class"])
        for r in registry.QUERIES["parts_pareto_abc"](spark, str(tmp_path)).collect()
    ]
    assert got == [
        (6, 1, 64.0, "A"),  # starts at 0% of revenue
        (3, 2, 16.0, "A"),  # starts at 64/92 = 69.6% < 80%
        (2, 2, 8.0, "B"),   # starts at 80/92 = 87.0% in [80%, 95%)
        (0, 4, 4.0, "C"),   # starts at 88/92 = 95.7% >= 95%
    ]
