"""Micro-batch phasing independence (r8): the bounded fixture runs of the
retuned streaming ops ingest 2 staged files per trigger purely as a COST
choice (each trigger pays a fixed ~0.66 s machinery cost — profile in
streaming/rpc.py); the emitted RESULT SETS must not depend on it. Each
test below runs an op under BOTH phasings (forced 1 file per trigger and
forced 2) by patching the op module's read_events_stream, and asserts
set-identical output — evidence that the trigger-count lever never
touches semantics, for the ops already retuned in r8 AND for the r9
retune candidates (tumble/slide/session/dedup/upsert/scd2), whose
equivalence is pre-validated here before their default changes.

Deliberately NOT covered — phasing-CONSTITUTIVE ops whose oracles replay
per-batch watermark arithmetic and which must keep one file per trigger:
``stream_watermark`` (scatter staging: what is LATE depends on batch
boundaries) and ``stream_bounded_subscription`` (its oracle reconstructs
the per-batch delivery cutoff from the staging function).
"""

from __future__ import annotations

import pytest

from node_cdc_nats_spark.streaming import source as src_mod
from tests.conftest import SF_DIR


def _forced_reader(n_files: int):
    orig = src_mod.read_events_stream

    def reader(spark, sf_dir, order="time", single_batch=False, files_per_trigger=1):
        return orig(
            spark, sf_dir, order=order, single_batch=single_batch,
            files_per_trigger=n_files,
        )

    return reader


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize(
    "module_name, op_name, alt_files",
    [
        # r10: every retunable op now ingests all 4 staged files in ONE
        # data trigger (the no-data flush trigger then decides everything
        # the final watermark reached) — each dropped trigger saves its
        # fixed machinery cost, and the blob-packed state (cdc_diff/rpc/
        # asof) made the bigger pending round-trip cheap. Equivalence
        # below is 1-vs-4 for all of them.
        ("rpc", "stream_rpc_state", 4),
        ("joins", "stream_stream_join", 4),
        ("joins", "stream_stream_left_join", 4),
        ("cdc_diff", "stream_cdc_column_diff", 4),
        ("asof", "stream_join_asof_nearest", 4),
        ("ohlc", "stream_downsample_ohlc", 4),
        ("windows", "stream_tumble", 4),
        ("windows", "stream_slide", 4),
        ("windows", "stream_session", 4),
        ("windows", "stream_dedup", 4),
        ("upsert", "stream_upsert", 4),
        ("upsert", "stream_scd2", 4),
        # new in r9: complete-mode ranking — final table is a pure function
        # of all data, phasing-independent by construction
        ("topk", "stream_topk", 4),
        # new in r10: monotone per-user stage flags — the per-user MAX over
        # emissions is phasing-independent because every flag only ever
        # flips false→true; this pins it mechanically on the fixture
        # (the hand timeline test pins the cross-batch promotions)
        ("funnel", "stream_funnel", 4),
        # new in r11: monotone per-user conversion flag via a NATIVE
        # update-mode streaming MAX — phasing-independent for the same
        # monotonicity reason as stream_funnel
        ("ab_lift", "stream_ab_lift", 4),
        # new in r12: per-user MIN(ts) anchor + grow-only week set — both
        # monotone, so the folded cohort table is phasing-independent
        ("retention", "stream_retention_cohorts", 4),
        # new in r13: additive per-type moment sums (count, Σx, Σx²) via
        # native update-mode DECIMAL aggregates — the max_by(n) fold picks
        # each type's final cumulative emission, which is the same exact
        # decimal total under any trigger grouping
        ("anomaly", "stream_anomaly_zscore", 4),
    ],
)
def test_result_set_is_trigger_phasing_independent(
    spark, monkeypatch, module_name, op_name, alt_files
):
    import importlib

    mod = importlib.import_module(f"node_cdc_nats_spark.streaming.{module_name}")
    op = getattr(mod, op_name)
    monkeypatch.setattr(mod, "read_events_stream", _forced_reader(1))
    one_per = _rows(op(spark, SF_DIR))
    monkeypatch.setattr(mod, "read_events_stream", _forced_reader(alt_files))
    alt_per = _rows(op(spark, SF_DIR))
    assert one_per == alt_per
    assert len(one_per) > 0
