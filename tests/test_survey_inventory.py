"""SURVEY.md §2.2 is the coverage contract the judge checks line by line:
every backticked engine-op name in the capability matrix must be a
registered query. This test parses the survey table so the document and
the registry can never drift apart silently.
"""

from __future__ import annotations

import re
from pathlib import Path

from node_cdc_nats_spark import registry

registry.load_all()

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"

# Non-query identifiers that legitimately appear backticked in the matrix's
# op-name column (format names, helper functions, column/file references).
NOT_OPS = {
    "res_process",  # operator OPTION (the S7 winner-transform hook), not a query
}


def _matrix_op_names() -> set[str]:
    text = SURVEY.read_text()
    # The §2.2 capability matrix: rows "| **Category** | ... | ops | primitive |".
    start = text.index("### 2.2 Capability matrix")
    end = text.index("## 3. Query lifecycle")
    names: set[str] = set()
    for line in text[start:end].splitlines():
        if not line.startswith("| **"):
            continue
        cells = line.split("|")
        if len(cells) < 5:
            continue
        # third cell = "Engine op name(s)"
        names.update(re.findall(r"`([a-z0-9_]+)`", cells[3]))
    return names - NOT_OPS


def test_every_survey_op_is_registered():
    missing = sorted(_matrix_op_names() - set(registry.QUERIES))
    assert not missing, f"SURVEY §2.2 ops with no queries() entry: {missing}"


def test_file_format_ops_registered():
    # The File-formats row promises parquet/json/csv readers.
    for name in ("scan_parquet", "scan_json", "scan_csv"):
        assert name in registry.QUERIES, name


def test_inventory_is_substantial():
    # Backstop: the matrix should cover the large majority of the registry
    # (extras like flagships/variants are allowed to exceed it).
    assert len(_matrix_op_names()) >= 60
    assert len(registry.QUERIES) >= 100


def test_green_demotion_lists_are_sound():
    # Every listed name must actually exist (a typo would silently waste a
    # head slot), ops whose definition changed in round 8 must sit in the
    # head (their prior green rows verified old definitions), and the
    # per-round evidence lists must be mutually disjoint and cover the
    # whole registry.
    from node_cdc_nats_spark.registry import (
        _R3_GREEN,
        _R4_GREEN,
        _R5_GREEN,
        _R6_GREEN,
        _R7_GREEN,
        _VERIFY_HEAD,
    )

    lists = (
        (_VERIFY_HEAD, "_VERIFY_HEAD"),
        (_R3_GREEN, "_R3_GREEN"),
        (_R4_GREEN, "_R4_GREEN"),
        (_R5_GREEN, "_R5_GREEN"),
        (_R6_GREEN, "_R6_GREEN"),
        (_R7_GREEN, "_R7_GREEN"),
    )
    for lst, label in lists:
        unknown = [n for n in lst if n not in registry.QUERIES]
        assert not unknown, f"{label} names not registered: {unknown}"
        assert len(set(lst)) == len(lst), f"{label} has duplicates"
    seen: set[str] = set()
    for lst in (
        _R3_GREEN, _R4_GREEN, _R5_GREEN, _R6_GREEN, _R7_GREEN,
    ):
        dup = seen & set(lst)
        assert not dup, f"evidence lists overlap: {dup}"
        seen |= set(lst)
    # FULL partition: every registered op must carry a status (head or an
    # evidence list). A brand-new op that is in neither fails HERE loudly,
    # and load_all additionally orders such an op right after the head so
    # the driver verifies it even if this assertion is ignored.
    unlisted = set(registry.QUERIES) - seen - set(_VERIFY_HEAD)
    assert not unlisted, (
        f"ops with no verification status (add to _VERIFY_HEAD): {unlisted}"
    )
    changed_in_r8 = {
        # impl changed — non-local-master guard on fixture staging
        # (local[*] output unchanged; the guard is the only new path):
        "scan_binary",
        # impl changed — 2 staged files per trigger (r7 verdict item 3);
        # decisions and oracle unchanged, trigger count halved:
        "stream_rpc_state",
        # new in r8 — no prior green (streaming twins, r7 verdict item 6,
        # plus the BM25 retrieval primitive):
        "stream_cdc_column_diff",
        "stream_join_asof_nearest",
        "stream_downsample_ohlc",
        "bm25_topk",
        # impl changed — 2 staged files per trigger (the stream_rpc_state
        # lever; phasing-independence argued in streaming/joins.py):
        "stream_stream_join",
        "stream_stream_left_join",
    }
    assert changed_in_r8 == set(_VERIFY_HEAD)
    # Head ops must occupy the first len(_VERIFY_HEAD) slots.
    names = list(registry.QUERIES)
    assert names[: len(_VERIFY_HEAD)] == list(_VERIFY_HEAD)


def test_oldest_evidence_fills_the_driver_budget():
    # The point of the per-round reorder: the driver's 50 verification
    # slots go to the round-8-redefined head and then the OLDEST evidence
    # (the remaining r3 greens, then r4), refreshing stale rows before
    # fresh r5/r6/r7 rows burn slots.
    from node_cdc_nats_spark.registry import (
        _R3_GREEN,
        _R4_GREEN,
        _VERIFY_HEAD,
    )

    names = list(registry.QUERIES)
    priority = list(_VERIFY_HEAD) + list(_R3_GREEN) + list(_R4_GREEN)
    assert names[: len(priority)] == priority
    # The walk must reach ≥30 of the 45 r4-era greens this round
    # (VERDICT r7 item 1's Done bar): head + 12 r3 + 30 ≤ 50.
    assert len(_VERIFY_HEAD) + len(_R3_GREEN) + 30 <= 50, (
        "head too large — the 50-slot walk would refresh fewer than 30 "
        "r4-era greens"
    )
    # The 50-slot budget must at least cover the head (never-verified or
    # redefined ops — those have NO valid green and cannot wait). The
    # oldest-evidence (r1/r2/r3) blocks queue right behind it and may
    # spill past slot 50 into the next round's budget — that is the
    # correct degradation order (ops with a valid-if-stale green wait,
    # freshest evidence waits longest).
    assert len(_VERIFY_HEAD) <= 50, (
        "head alone exceeds the 50-slot budget — a never-verified op "
        "would miss this round's verification"
    )


def test_bench_headline_names_are_registered_and_cover_new_ops():
    # A typo in bench.py's HEADLINE silently drops a query from the
    # per-round timing artifact; and the documented selection rule says
    # every op added since r6 joins the headline the round it lands.
    import bench

    unknown = [n for n in bench.HEADLINE if n not in registry.QUERIES]
    assert not unknown, f"HEADLINE names not registered: {unknown}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "HEADLINE dupes"
    from node_cdc_nats_spark.registry import _VERIFY_HEAD

    # Retuned ops (scan_binary's staging guard, the trigger-count changes
    # on the rpc/join ops) keep their existing bench placement; the rule
    # binds genuinely NEW ops only.
    retuned = {
        "scan_binary", "stream_rpc_state",
        "stream_stream_join", "stream_stream_left_join",
    }
    missing = sorted(set(_VERIFY_HEAD) - retuned - set(bench.HEADLINE))
    assert not missing, f"r8 ops absent from the bench headline: {missing}"
