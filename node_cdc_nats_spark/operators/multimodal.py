"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata,
decode / feature-extract / frame-sample as Arrow-batched Pandas operators.

The decode step is STUBBED (image/audio libraries are not in this
container): ``_decode_stub`` produces a deterministic fake feature vector
from the raw bytes. Everything Spark-side — binary column handling, schema,
``mapInPandas`` batch shape, partition behavior — is real and tested; swap
``_decode_stub`` for a PIL/torchaudio call and nothing else changes.

The fixture media is synthesized from ``documents.text`` (UTF-8 bytes as
the opaque payload), mirroring how the reference treats payloads as opaque
``bytes`` whose meaning comes from ``contentType``
(``/root/reference/examples/cdc-pub.js:34,39``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..registry import register
from .dedup import banded_hamming_pairs

FEATURE_DIM = 4


def as_media(documents: DataFrame) -> DataFrame:
    """Wrap documents as a media table: opaque binary payload + metadata."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes,
           'text/plain' AS mime
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id", F.col("meta.n_bytes").alias("n_bytes"), F.col("meta.mime").alias("mime")
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, CAST(UNNEST(RANGE(OCTET_LENGTH(ENCODE(text)) % 5 + 1)) AS INT) AS frame_idx
    FROM documents
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: each media row expands to its sampled frame
    indices (count derived deterministically from payload size, standing in
    for a video's frame count). The explode is the real operator; the frame
    decode itself is the stubbed step."""
    media = as_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_bytes") % 5)).alias("fi"),
    ).select("doc_id", F.col("fi").cast("int").alias("frame_idx"))


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas:
    the decode path is per-partition batch iteration, never per-row Python
    UDF calls).

    The decode stub is defined INSIDE the closure on purpose: cloudpickle
    serializes nested functions by value, so executor Python workers never
    need this package importable on their own sys.path (they generally
    don't have it — only the driver does)."""

    feature_dim = FEATURE_DIM

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode_stub(payload: bytes) -> list[float]:
            # STUB: deterministic fake features from raw bytes. A real
            # deployment swaps in e.g. PIL.Image.open + resize + embed; the
            # contract (bytes in, fixed-dim float vector out) is unchanged.
            n = len(payload)
            if n == 0:
                return [0.0] * feature_dim
            return [
                float(n),
                float(payload[0]),
                float(payload[-1]),
                float(sum(payload[:32]) % 997),
            ]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": pdf["payload"].map(decode_stub),
                }
            )

    return media.mapInPandas(op, schema="doc_id long, n_bytes int, features array<double>")


# Deterministic fake decode → actually SQL-expressible, so the plumbing gets
# a full value-level oracle instead of a rows-only check. (DuckDB can't index
# BLOB bytes directly; the fixture text is ASCII, so byte k == ASCII(char k).)
@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes,
           ARRAY_TO_STRING(LIST_TRANSFORM(
             [CAST(OCTET_LENGTH(ENCODE(text)) AS DOUBLE),
              CAST(ASCII(SUBSTR(text, 1, 1)) AS DOUBLE),
              CAST(ASCII(SUBSTR(text, LENGTH(text), 1)) AS DOUBLE),
              CAST(LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
                     LIST_TRANSFORM(RANGE(LEAST(LENGTH(text), 32)),
                                    i -> CAST(ASCII(SUBSTR(text, CAST(i+1 AS INT), 1)) AS BIGINT))),
                   (a, x) -> a + x) % 997 AS DOUBLE)],
             x -> CAST(CAST(x AS BIGINT) AS VARCHAR)), ',') AS features
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The vector pipeline (extract_features) is the real operator; the
    # registered query renders the array as a comma-joined integer string
    # because the driver's canonicalizer cannot hash array cells. Every
    # stub feature is integer-valued by construction, so the rendering is
    # exact on both engines.
    media = as_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media).withColumn(
        "features",
        F.array_join(
            F.transform("features", lambda x: x.cast("bigint").cast("string")), ","
        ),
    )


def resize_media(media: DataFrame, target: int = 16) -> DataFrame:
    """Resize plumbing over opaque payloads (`mapInPandas`, Arrow batches):
    nearest-neighbor downsample of the payload byte sequence to a fixed
    target length — the exact batch shape, schema, and partition behavior
    of an image resize, with the pixel decode stubbed (no image libs in
    this container; swap the inner function for PIL `Image.resize` and
    nothing else changes). Map-side only: no shuffle at any scale."""

    tgt = target

    def op(batches):
        import pandas as pd

        def resize_stub(payload: bytes) -> bytes:
            # STUB decode+resize: nearest-neighbor sample of the byte
            # stream at `tgt` evenly spaced offsets (deterministic; byte
            # k of the output = byte floor(k*n/tgt) of the input).
            n = len(payload)
            if n == 0:
                return b"\x00" * tgt
            return bytes(payload[(k * n) // tgt] for k in range(tgt))

        for pdf in batches:
            out = pdf["payload"].map(resize_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": out,
                    "orig_bytes": pdf["payload"].map(len).astype("int32"),
                }
            )

    return media.mapInPandas(
        op, schema="doc_id long, resized binary, orig_bytes int"
    )


@register(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           ARRAY_TO_STRING(LIST_TRANSFORM(RANGE({16}),
             k -> CAST(ASCII(SUBSTR(text,
                    CAST((k * LENGTH(text)) // {16} + 1 AS INT), 1)) AS VARCHAR)),
             ',') AS resized_csv,
           CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS orig_bytes
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Driver-facing rendering: the resized binary as a comma-joined byte
    # string (binary cells crash the driver canonicalizer; fixture text is
    # ASCII so DuckDB's char-indexed oracle sees the same bytes).
    media = as_media(load_table(spark, sf_dir, "documents"))
    resized = resize_media(media)
    csv = F.array_join(
        F.transform(
            # binary -> byte values: ASCII fixture payloads decode 1:1, so
            # ascii(char k) == byte k
            F.sequence(F.lit(0), F.lit(15)),
            lambda k: F.ascii(
                F.col("resized").cast("string").substr(k + 1, F.lit(1))
            ).cast("string"),
        ),
        ",",
    )
    return resized.select("doc_id", csv.alias("resized_csv"), "orig_bytes")


@register(
    "multimodal_dedup",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             -- DuckDB's md5 takes VARCHAR and hashes its UTF-8 bytes,
             -- which are exactly the engine's payload bytes
             MD5(text) AS payload_md5,
             CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes
      FROM documents),
    k AS (
      SELECT doc_id, payload_md5, n_bytes,
             ROW_NUMBER() OVER (PARTITION BY payload_md5 ORDER BY doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY payload_md5) AS n_copies
      FROM h)
    SELECT doc_id, payload_md5, n_bytes, CAST(n_copies AS BIGINT) AS n_copies
    FROM k WHERE rn = 1
    """,
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact dedup over the opaque media payload column: keep the
    lowest doc_id per distinct payload, reporting its md5, size, and how
    many copies it had — the media-side twin of ``dedup_exact`` (re-crawled
    images/audio are byte-identical far more often than text).

    Scale plan: the md5 is computed map-side over the binary column (never
    the decoded media), so the ONE shuffle carries 16-byte digests + ids,
    not payloads — at 100 TB of media this is the difference between
    shuffling 100 TB and shuffling ~50 GB of digests. Keep-first and the
    copy census share the same hash partitioning (one window, one
    exchange). The payloads themselves never leave their input partitions.
    """
    media = as_media(load_table(spark, sf_dir, "documents"))
    from pyspark.sql import Window as W

    h = media.select(
        "doc_id",
        F.md5("payload").alias("payload_md5"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    win = W.partitionBy("payload_md5")
    k = h.select(
        "doc_id", "payload_md5", "n_bytes",
        F.row_number().over(win.orderBy("doc_id")).alias("rn"),
        F.count(F.lit(1)).over(win).alias("n_copies"),
    )
    return k.filter(F.col("rn") == 1).select(
        "doc_id", "payload_md5", "n_bytes", "n_copies"
    )


# --- Perceptual near-dup (r10 verdict item 6) -------------------------------
#
# dHash over the stubbed decode grid: sample PHASH_GRID "luma" values at
# evenly spaced payload offsets (the same deterministic stand-in for a
# decoded/resized grayscale grid that multimodal_resize uses — swap the
# sampler for a real decode+resize and the hash/banding pipeline is
# unchanged), then one bit per ADJACENT-sample comparison. Classic dHash is
# robust to exactly what re-encoding perturbs — global brightness/contrast
# and small local noise shift absolute values but rarely flip the ORDER of
# adjacent cells — while distinct media average ~PHASH_BITS/2 flipped bits.
PHASH_GRID = 61  # samples; PHASH_GRID - 1 comparisons = the hash bits
PHASH_BITS = 60  # 60 keeps the hash positive in an int64 (house style:
#                  dedup_simhash's 60-bit fingerprints)
PHASH_HAMMING_MAX = 4  # pigeonhole: <= 4 flips => >= 2 of 6 bands intact


@register(
    "multimodal_dedup_perceptual",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             LIST_TRANSFORM(RANGE({PHASH_GRID}),
               k -> ASCII(SUBSTR(text,
                      CAST((k * LENGTH(text)) // {PHASH_GRID} AS INT) + 1,
                      1))) AS s
      FROM documents),
    h AS (
      SELECT doc_id,
             CAST(LIST_SUM(LIST_TRANSFORM(RANGE({PHASH_BITS}),
               k -> CASE WHEN s[CAST(k AS INT) + 1] > s[CAST(k AS INT) + 2]
                         THEN CAST(1 AS BIGINT) << CAST(k AS INT)
                         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
      FROM g)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(BIT_COUNT(XOR(a.phash, b.phash)) AS INT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE BIT_COUNT(XOR(a.phash, b.phash)) <= {PHASH_HAMMING_MAX}
    """,
)
def multimodal_dedup_perceptual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over the media payload column (Hamming ≤
    {PHASH_HAMMING_MAX} over 60-bit dHash fingerprints) — the near-dup
    complement of byte-exact ``multimodal_dedup``: a re-encode of the same
    image (different compressor, same pixels) changes every byte, so its
    md5 differs, but the ORDER of adjacent cells in the decoded grid — and
    hence the dHash — survives.

    Spark plan (the shared ``banded_hamming_pairs`` skeleton — see its
    docstring for the pigeonhole proof and measured candidate volumes):
    fingerprint projection map-side → explode into the C(6,2)=15
    pair-of-bands keys (6×10-bit bands, 20-bit values) → groupBy band-pair
    bucket, collect (doc_id, phash) → in-bucket pair generation with the
    Hamming filter INSIDE the generator (candidates never materialize) →
    exact Hamming verify on the carried 8-byte fingerprints. Pigeonhole
    guarantees any pair within Hamming ≤ {PHASH_HAMMING_MAX} leaves ≥ 2 of
    the 6 bands intact, so the banded plan returns EXACTLY the oracle's
    quadratic join result while shuffling only digests + ids (the payloads
    never leave their input partitions — at 100 TB of media the only
    corpus-sized cost is the map-side decode pass), and the 20-bit
    keyspace keeps re-crawled-media bucket skew bounded where the r11
    12-bit keys went quadratic. The decode grid is the same
    deterministic stub contract as ``multimodal_features``/``_resize``
    (bytes sampled at evenly spaced offsets); a real deployment swaps the
    sampler for decode+resize-to-grid and nothing downstream changes.
    """
    # UDF defined in-function: @pandas_udf parses its return type against
    # the ACTIVE session, so a module-level definition would break plain
    # imports (registry.load_all runs before any SparkSession exists) —
    # same placement as dedup_simhash's fingerprint UDF.
    @F.pandas_udf("long")
    def _phash_dhash60(texts: pd.Series) -> pd.Series:
        """The 60-bit dHash, Arrow-vectorized (the dedup_simhash lesson,
        re-learned here by measurement: the 61-substr + 60-comparison built-in
        expression tree collapses into one duplicated interpreted projection —
        ~0.7 s for 5k docs — while this numpy version does the identical
        integer arithmetic in ~0.05 s). Self-contained: executors don't have
        the repo on sys.path. Byte-offset sampling == the oracle's char-offset
        ASCII(SUBSTR(...)) because the fixture text is ASCII (byte k == char
        k) — the same stub contract multimodal_resize documents."""
        import numpy as np
        import pandas as pd  # noqa: F811 — by-value closure for executors

        grid, bits = 61, 60
        ks = np.arange(grid, dtype=np.int64)
        shifts = np.arange(bits, dtype=np.int64)
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if t is None or not t:
                # NULL and '' both hash to 0 in the oracle (ASCII(SUBSTR)
                # yields NULL/0 on every sample, the CASE takes the ELSE 0
                # branch either way — measured in DuckDB, not assumed);
                # None.encode would crash the executor (ADVICE r11).
                continue
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            n = len(b)
            if n == 0:
                continue  # ASCII('') == 0 on every sample -> no bit set
            s = b[(ks * n) // grid].astype(np.int64)
            out[i] = int(((s[:-1] > s[1:]).astype(np.int64) << shifts).sum())
        return pd.Series(out)

    d = load_table(spark, sf_dir, "documents")
    hashed = d.select("doc_id", _phash_dhash60(F.col("text")).alias("phash"))
    return banded_hamming_pairs(
        hashed, "phash", bits=PHASH_BITS, hamming_max=PHASH_HAMMING_MAX
    )


# Two videos are near-dups when at least this many sampled-frame pairs land
# within PHASH_HAMMING_MAX of each other. 2-of-≤5 tolerates one corrupted /
# retimed frame per clip while a single coincidental frame collision cannot
# fabricate a video match.
VIDEO_MIN_FRAME_MATCHES = 2


@register(
    "multimodal_dedup_video",
    oracle=f"""
    WITH fr AS (
      SELECT doc_id, text,
             OCTET_LENGTH(ENCODE(text)) AS n,
             OCTET_LENGTH(ENCODE(text)) % 5 + 1 AS nf,
             CAST(UNNEST(RANGE(OCTET_LENGTH(ENCODE(text)) % 5 + 1)) AS BIGINT) AS f
      FROM documents),
    g AS (
      SELECT doc_id, f,
             LIST_TRANSFORM(RANGE({PHASH_GRID}),
               k -> ASCII(SUBSTR(text,
                      CAST((f * n) // nf
                           + (k * (((f + 1) * n) // nf - (f * n) // nf))
                             // {PHASH_GRID} AS INT) + 1,
                      1))) AS s
      FROM fr),
    h AS (
      SELECT doc_id, f,
             CAST(LIST_SUM(LIST_TRANSFORM(RANGE({PHASH_BITS}),
               k -> CASE WHEN s[CAST(k AS INT) + 1] > s[CAST(k AS INT) + 2]
                         THEN CAST(1 AS BIGINT) << CAST(k AS INT)
                         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS ph
      FROM g),
    m AS (
      SELECT a.doc_id AS video_a, b.doc_id AS video_b, COUNT(*) AS nm
      FROM h a JOIN h b
        ON a.doc_id < b.doc_id
       AND BIT_COUNT(XOR(a.ph, b.ph)) <= {PHASH_HAMMING_MAX}
      GROUP BY 1, 2)
    SELECT video_a, video_b, CAST(nm AS BIGINT) AS n_frame_matches
    FROM m WHERE nm >= {VIDEO_MIN_FRAME_MATCHES}
    """,
)
def multimodal_dedup_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup VIDEO detection: two media payloads are a pair when at
    least {VIDEO_MIN_FRAME_MATCHES} of their sampled-frame fingerprints
    land within Hamming ≤ {PHASH_HAMMING_MAX} — the re-crawled/re-encoded
    clip detector that byte-exact ``multimodal_dedup`` and single-image
    ``multimodal_dedup_perceptual`` both miss, composing
    ``multimodal_frame_sample``'s sampling contract (``n_bytes % 5 + 1``
    frames per payload — a real deployment swaps in fps-spaced decoded
    frames and nothing downstream changes) with the per-frame 60-bit dHash
    of the perceptual pipeline. Frames match CROSS-position, so a
    re-ordered or trimmed clip still pairs.

    Spark plan: ONE Arrow pandas_udf pass fingerprints every frame of a
    payload map-side (the payload never shuffles; only nf × 8-byte hashes
    + ids leave the scan) → posexplode to (video, frame) rows keyed by the
    composite id video*8+frame → the shared pair-of-bands skeleton
    (:func:`~node_cdc_nats_spark.operators.dedup.banded_hamming_pairs`,
    C(6,2)=15 tables of 20-bit keys, Hamming filter inside the in-bucket
    generator) emits matching FRAME pairs — the one-to-many frame relation
    rides the same banded plan, multiplying rows by nf ≤ 5, not the
    keyspace — → decompose composites, drop same-video pairs (composite
    order preserves video order, so video_a < video_b survives), and one
    count-per-video-pair aggregate with the ≥ {VIDEO_MIN_FRAME_MATCHES}
    HAVING. The oracle states the quadratic frame-join truth; pigeonhole
    keeps the banded plan exactly equal to it."""
    @F.pandas_udf("array<long>")
    def _frame_dhashes(texts):
        # Self-contained (executors lack the repo on sys.path); NULL text
        # yields an EMPTY frame list — the oracle's RANGE(NULL) unnests to
        # zero rows — while an empty payload has one all-zero frame
        # (ASCII('') = 0 on every sample).
        import numpy as np
        import pandas as pd

        grid, bits = 61, 60  # PHASH_GRID/PHASH_BITS by value (self-contained)
        ks = np.arange(grid, dtype=np.int64)
        shifts = np.arange(bits, dtype=np.int64)
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            n = len(b)
            nf = n % 5 + 1
            hs = []
            for f in range(nf):
                start = (f * n) // nf
                seg_len = ((f + 1) * n) // nf - start
                if n == 0:
                    hs.append(0)
                    continue
                s = b[start + (ks * seg_len) // grid].astype(np.int64)
                hs.append(int(((s[:-1] > s[1:]).astype(np.int64) << shifts).sum()))
            out.append(hs)
        return pd.Series(out)

    d = load_table(spark, sf_dir, "documents")
    frames = d.select(
        "doc_id", F.posexplode(_frame_dhashes(F.col("text"))).alias("f", "ph")
    ).select((F.col("doc_id") * 8 + F.col("f")).alias("doc_id"), "ph")
    fpairs = banded_hamming_pairs(
        frames, "ph", bits=PHASH_BITS, hamming_max=PHASH_HAMMING_MAX
    )
    return (
        fpairs.select(
            # Integer decomposition of the composite id (doc_id*8 + f,
            # f in 0..4): `/` is double division, exact only below 2^53
            # and truncating toward zero on negatives — shiftright is
            # exact at every long magnitude (ADVICE r12).
            F.shiftright("doc_a", 3).alias("video_a"),
            F.shiftright("doc_b", 3).alias("video_b"),
        )
        .filter(F.col("video_a") != F.col("video_b"))
        .groupBy("video_a", "video_b")
        .agg(F.count(F.lit(1)).alias("n_frame_matches"))
        .filter(F.col("n_frame_matches") >= VIDEO_MIN_FRAME_MATCHES)
    )
