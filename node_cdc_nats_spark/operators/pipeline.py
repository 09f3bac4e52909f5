"""Training-data-pipeline operators (round 2 widening of the north-star
surface): deterministic corpus splits/sampling, Gopher-style quality
gates, corpus n-gram statistics, benchmark decontamination, repetition
scoring, PII redaction, and embedding normalization/quantization.

The reference (rigoiot/node-cdc-nats) is transport-only — none of this
exists there (`lib/nats.js:1-256` has no data operators at all); these
ops extend the engine the same way `operators/text.py` / `dedup.py` do,
per the project north star (BASELINE.json: LLM-data-pipeline operators).

Scale notes (100 TB design point):
- Splits / sampling / quality gates / repetition / redaction are pure
  map-side projections or filters over built-in expressions — no
  shuffle, whole-stage codegen, trivially parallel at any scale.
- `topk_ngrams` / `corpus_vocab_stats` are explode → partial+final hash
  aggregation (Catalyst map-side combines before the one shuffle on the
  gram/token key) + `TakeOrderedAndProject` for the top-k.
- `decontaminate_ngram` broadcasts the (small, fixed) benchmark gram
  set; the train side never shuffles — contamination marking is a
  broadcast left-semi-style join + aggregation keyed by doc_id only.

Determinism: split/sample bucketing hashes the md5 hex of the key —
identical text on both engines; ratio columns use single-division IEEE
expressions with the same shape in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..cache import managed_persist
from ..registry import register

_HEX = "0123456789abcdef"

# md5-hex nibble buckets, expressible identically in Spark SQL and
# DuckDB: position of hex digit k of md5(key-as-string) in the hex
# alphabet. b16 in [0,16); b256 in [0,256).
_B16_SPARK = (
    "instr('{hex}', substr(md5(cast({key} as binary)), 1, 1)) - 1"
)
_B256_SPARK = (
    "(instr('{hex}', substr(md5(cast({key} as binary)), 1, 1)) - 1) * 16 + "
    "instr('{hex}', substr(md5(cast({key} as binary)), 2, 1)) - 1"
)
_B16_DUCK = "STRPOS('{hex}', SUBSTR(MD5(CAST({key} AS VARCHAR)), 1, 1)) - 1"
_B256_DUCK = (
    "(STRPOS('{hex}', SUBSTR(MD5(CAST({key} AS VARCHAR)), 1, 1)) - 1) * 16 + "
    "STRPOS('{hex}', SUBSTR(MD5(CAST({key} AS VARCHAR)), 2, 1)) - 1"
)


def _b16_spark(key: str) -> F.Column:
    return F.expr(_B16_SPARK.format(hex=_HEX, key=f"cast({key} as string)")).cast("int")


def _b256_spark(key: str) -> F.Column:
    return F.expr(_B256_SPARK.format(hex=_HEX, key=f"cast({key} as string)")).cast("int")


# Normalized whitespace tokens — the SAME chain as text_normalize, imported
# so the ngram/quality consumers can never drift from it.
from .text import NORM_DUCK_SQL as _NORM_DUCK, NORM_SPARK_SQL as _NORM_SPARK  # noqa: E402


@register(
    "train_val_split",
    oracle=f"""
    SELECT doc_id, lang,
           CAST({_B16_DUCK.format(hex=_HEX, key='doc_id')} AS INT) AS bucket,
           CASE WHEN {_B16_DUCK.format(hex=_HEX, key='doc_id')} < 13 THEN 'train'
                WHEN {_B16_DUCK.format(hex=_HEX, key='doc_id')} < 15 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 13/2/1 train/val/test assignment by md5-nibble bucket
    of the document key. Content-addressed (not random): re-runs, backfills
    and multi-cluster jobs agree on the split with zero coordination — the
    property a 100 TB corpus split actually needs. Pure map-side."""
    d = load_table(spark, sf_dir, "documents")
    b = _b16_spark("doc_id")
    split = (
        F.when(b < 13, "train").when(b < 15, "val").otherwise("test")
    )
    return d.select("doc_id", "lang", b.alias("bucket"), split.alias("split"))


@register(
    "sample_stratified",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang, source,
             CAST({_B256_DUCK.format(hex=_HEX, key='doc_id')} AS INT) AS bucket
      FROM documents)
    SELECT doc_id, lang, source, bucket
    FROM b
    WHERE bucket < CASE lang WHEN 'en' THEN 64 WHEN 'zh' THEN 128 ELSE 256 END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-language keep rates (en 25%,
    zh 50%, rest 100%) — the language-rebalancing pass of a pre-training
    mix. Hash-bucketed (deterministic, coordination-free), map-side
    filter; at scale this is a scan+filter with zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    b = _b256_spark("doc_id")
    rate = (
        F.when(F.col("lang") == "en", 64)
        .when(F.col("lang") == "zh", 128)
        .otherwise(256)
    )
    return (
        d.select("doc_id", "lang", "source", b.alias("bucket"))
        .filter(F.col("bucket") < rate)
    )


_STOP_EN = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


@register(
    "quality_filter_gopher",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             STRING_SPLIT({_NORM_DUCK}, ' ') AS toks,
             LENGTH(REPLACE({_NORM_DUCK}, ' ', '')) AS alpha_chars
      FROM documents)
    SELECT doc_id, lang,
           LEN(toks) BETWEEN 20 AND 1000 AS len_ok,
           CAST(alpha_chars AS DOUBLE) / LEN(toks) BETWEEN 2.0 AND 12.0 AS word_len_ok,
           CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) >= 0.2 AS diversity_ok,
           LEN(LIST_FILTER(toks, x -> x IN ({", ".join(f"''{w}''".replace("''", chr(39)) for w in _STOP_EN)}))) >= 1 AS stopword_ok,
           (LEN(toks) BETWEEN 20 AND 1000)
             AND (CAST(alpha_chars AS DOUBLE) / LEN(toks) BETWEEN 2.0 AND 12.0)
             AND (CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) >= 0.2)
             AND (LEN(LIST_FILTER(toks, x -> x IN ({", ".join(f"''{w}''".replace("''", chr(39)) for w in _STOP_EN)}))) >= 1) AS passes
    FROM t
    """,
)
def quality_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate (length bounds, mean word
    length bounds, lexical diversity, stopword presence). All built-in
    HOF projections — map-side, codegen'd, no shuffle at any scale."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.expr(_NORM_SPARK)
    toks = F.split(norm, " ")
    n = F.size(toks)
    awl = F.length(F.replace(norm, F.lit(" "), F.lit(""))).cast("double") / n
    div = F.size(F.array_distinct(toks)).cast("double") / n
    stop = F.size(F.filter(toks, lambda t: t.isin(*_STOP_EN)))
    len_ok = (n >= 20) & (n <= 1000)
    wl_ok = (awl >= 2.0) & (awl <= 12.0)
    div_ok = div >= 0.2
    stop_ok = stop >= 1
    return d.select(
        "doc_id",
        "lang",
        len_ok.alias("len_ok"),
        wl_ok.alias("word_len_ok"),
        div_ok.alias("diversity_ok"),
        stop_ok.alias("stopword_ok"),
        (len_ok & wl_ok & div_ok & stop_ok).alias("passes"),
    )


# Bigram list over normalized tokens. Spark sequence(1, n-1) is DESCENDING
# when n-1 < 1, so gate on n >= 2; DuckDB RANGE(1, n) is empty for n <= 1.
_BIGRAMS_SPARK = (
    "case when size({toks}) >= 2 then "
    "transform(sequence(1, size({toks}) - 1), i -> concat_ws(' ', slice({toks}, i, 2))) "
    "else array() end"
)
_BIGRAMS_DUCK = (
    "LIST_TRANSFORM(RANGE(1, GREATEST(LEN({toks}), 1)), i -> ARRAY_TO_STRING({toks}[i:i+1], ' '))"
)
_TRIGRAMS_SPARK = (
    "case when size({toks}) >= 3 then "
    "transform(sequence(1, size({toks}) - 2), i -> concat_ws(' ', slice({toks}, i, 3))) "
    "else array() end"
)
_TRIGRAMS_DUCK = (
    "LIST_TRANSFORM(RANGE(1, GREATEST(LEN({toks}) - 1, 1)), i -> ARRAY_TO_STRING({toks}[i:i+2], ' '))"
)


@register(
    "topk_ngrams",
    oracle=f"""
    WITH toks AS (SELECT STRING_SPLIT({_NORM_DUCK}, ' ') AS t FROM documents),
    g AS (SELECT UNNEST({_BIGRAMS_DUCK.format(toks='t')}) AS gram FROM toks)
    SELECT gram, COUNT(*) AS cnt
    FROM g GROUP BY gram
    ORDER BY cnt DESC, gram
    LIMIT 20
    """,
)
def topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-k bigrams: explode → hash agg → top-k. Catalyst
    runs the count as partial (map-side combine) + final on the single
    gram-key shuffle; the top-k is `TakeOrderedAndProject` (no global
    sort). Tie-broken (cnt DESC, gram ASC) so the result set is
    deterministic on both engines.

    The token array is materialized as a column BEFORE the gram lambda:
    HOF lambdas are interpreted (not codegen'd), so inlining the full
    normalize+split chain into the lambda re-evaluates it per element —
    O(tokens²) per document (measured 10.5s → ~1s at sf0.1)."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select(F.split(F.expr(_NORM_SPARK), " ").alias("toks"))
    return (
        toked.select(F.explode(F.expr(_BIGRAMS_SPARK.format(toks="toks"))).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram"))
        .limit(20)
    )


@register(
    "decontaminate_ngram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT({_NORM_DUCK}, ' ') AS t FROM documents),
    g AS (
      SELECT doc_id, UNNEST({_TRIGRAMS_DUCK.format(toks='t')}) AS gram FROM toks),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
    train AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 50 <> 0),
    hits AS (
      SELECT train.doc_id, COUNT(*) AS shared_ngrams
      FROM train JOIN bench USING (gram)
      GROUP BY train.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.shared_ngrams, 0) AS BIGINT) AS shared_ngrams,
           COALESCE(h.shared_ngrams, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 50 <> 0
    """,
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    token n-gram with a held-out benchmark set (here every 50th doc;
    n=3 for fixture-scale discrimination — production pipelines use
    n=10..13 with the identical plan shape).

    Scale: the benchmark gram set is small and broadcast; the train side
    explodes grams map-side, the broadcast inner join marks hits without
    shuffling the corpus, and the only shuffle is the per-doc count
    keyed by doc_id. No corpus-vs-corpus shuffle join anywhere."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", F.split(F.expr(_NORM_SPARK), " ").alias("toks"))
    g = toked.select(
        "doc_id", F.explode_outer(F.expr(_TRIGRAMS_SPARK.format(toks="toks"))).alias("gram")
    )
    bench = g.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
    train = g.filter(F.col("doc_id") % 50 != 0).select("doc_id", "gram").distinct()
    hits = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    base = d.filter(F.col("doc_id") % 50 != 0).select("doc_id")
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("shared_ngrams"), F.lit(0)).cast("long").alias("shared_ngrams"),
        (F.coalesce(F.col("shared_ngrams"), F.lit(0)) > 0).alias("contaminated"),
    )


@register(
    "repetition_ratio",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             STRING_SPLIT({_NORM_DUCK}, ' ') AS toks,
             {_TRIGRAMS_DUCK.format(toks=f"STRING_SPLIT({_NORM_DUCK}, ' ')")} AS tri
      FROM documents)
    SELECT doc_id,
           1.0 - CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) AS dup_token_ratio,
           CASE WHEN LEN(tri) = 0 THEN 0.0
                ELSE 1.0 - CAST(LEN(LIST_DISTINCT(tri)) AS DOUBLE) / LEN(tri) END AS dup_trigram_ratio
    FROM t
    """,
)
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition scores (duplicate-token and
    duplicate-trigram fractions) — the repetition filters applied to
    pre-training corpora. Pure HOF projection, map-side at any scale."""
    d = load_table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", F.split(F.expr(_NORM_SPARK), " ").alias("toks")
    ).select("doc_id", "toks", F.expr(_TRIGRAMS_SPARK.format(toks="toks")).alias("tri"))
    toks, tri = F.col("toks"), F.col("tri")
    dup_tok = 1.0 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    dup_tri = F.when(F.size(tri) == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(tri)).cast("double") / F.size(tri)
    )
    return staged.select(
        "doc_id",
        dup_tok.alias("dup_token_ratio"),
        dup_tri.alias("dup_trigram_ratio"),
    )


_PHONE_RE = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
_LONGNUM_RE = "[0-9]{5,}"


# Deterministic phone-shaped string derived from the customer key (the
# fixture customer table carries no phone column) — same arithmetic on
# both engines, so redaction is exercised non-vacuously.
_PHONE_DUCK = (
    "CONCAT(CAST(10 + c_nationkey % 90 AS VARCHAR), '-', "
    "LPAD(CAST(c_custkey % 1000 AS VARCHAR), 3, '0'), '-', "
    "LPAD(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0'), '-', "
    "LPAD(CAST((c_custkey * 31) % 10000 AS VARCHAR), 4, '0'))"
)
_PHONE_SPARK = (
    "concat(cast(10 + c_nationkey % 90 as string), '-', "
    "lpad(cast(c_custkey % 1000 as string), 3, '0'), '-', "
    "lpad(cast((c_custkey * 7) % 1000 as string), 3, '0'), '-', "
    "lpad(cast((c_custkey * 31) % 10000 as string), 4, '0'))"
)


@register(
    "pii_redact",
    oracle=f"""
    WITH t AS (
      SELECT c_custkey,
             CONCAT(c_name, ' ph ', {_PHONE_DUCK}, ' ', c_mktsegment) AS blob
      FROM customer)
    SELECT c_custkey,
           REGEXP_REPLACE(REGEXP_REPLACE(blob, '{_PHONE_RE}', '<PHONE>', 'g'),
                          '{_LONGNUM_RE}', '<NUM>', 'g') AS redacted,
           CAST(LEN(REGEXP_EXTRACT_ALL(blob, '{_PHONE_RE}')) AS INT) AS n_phones,
           CAST(LEN(REGEXP_EXTRACT_ALL(REGEXP_REPLACE(blob, '{_PHONE_RE}', '<PHONE>', 'g'),
                                       '{_LONGNUM_RE}')) AS INT) AS n_longnums
    FROM t
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: phone numbers and long digit runs replaced by
    typed placeholders, with per-row redaction counts (c_name carries a
    9-digit run; the phone field is synthesized deterministically from
    the key since the fixture has no phone column). Patterns evaluate
    identically under Java regex and RE2. Map-side regexp chain —
    codegen'd, no shuffle."""
    c = load_table(spark, sf_dir, "customer")
    blob = F.concat(
        F.col("c_name"), F.lit(" ph "), F.expr(_PHONE_SPARK), F.lit(" "), F.col("c_mktsegment")
    )
    dephoned = F.regexp_replace(blob, _PHONE_RE, "<PHONE>")
    return c.select(
        "c_custkey",
        F.regexp_replace(dephoned, _LONGNUM_RE, "<NUM>").alias("redacted"),
        F.regexp_count(blob, F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
        F.regexp_count(dephoned, F.lit(_LONGNUM_RE)).cast("int").alias("n_longnums"),
    )


@register(
    "corpus_vocab_stats",
    oracle=f"""
    WITH tok AS (
      SELECT UNNEST(STRING_SPLIT({_NORM_DUCK}, ' ')) AS token FROM documents),
    counts AS (
      SELECT token, COUNT(*) AS cnt FROM tok WHERE token <> '' GROUP BY token)
    SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
           CAST(MAX(cnt) AS BIGINT) AS max_token_freq
    FROM counts
    """,
)
def corpus_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics (total/distinct/hapax/max-frequency)
    — the vocabulary-coverage report a tokenizer-training pass needs.
    Two-stage aggregation: per-token hash agg (map-side partial combine
    before the token-key shuffle), then a single-row final agg."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.expr(_NORM_SPARK), " ")
    counts = (
        d.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).cast("long").alias("hapax_count"),
        F.max("cnt").cast("long").alias("max_token_freq"),
    )


@register(
    "sample_temperature",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
    m AS (SELECT MIN(n_lang) AS n_min FROM c),
    r AS (SELECT lang, n_lang,
                 CAST(FLOOR(256 * SQRT(CAST(n_min AS DOUBLE) / n_lang)) AS INT)
                   AS keep_buckets
          FROM c, m)
    SELECT d.doc_id, d.lang, r.keep_buckets,
           CAST({_B256_DUCK.format(hex=_HEX, key='d.doc_id')} AS INT) AS bucket
    FROM documents d JOIN r USING (lang)
    WHERE {_B256_DUCK.format(hex=_HEX, key='d.doc_id')} < r.keep_buckets
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced multilingual sampling (alpha = 0.5): each
    language keeps floor(256*sqrt(n_min/n_lang))/256 of its documents, so
    high-resource languages are down-sampled toward the rare ones — the
    standard corpus-rebalancing pass before pre-training. Selection is
    content-addressed (md5 bucket), so re-runs agree with zero
    coordination.

    Determinism across engines: n_min/n_lang, sqrt, *256 and floor are
    each IEEE correctly-rounded, so the bucket threshold is bit-identical
    in Spark and DuckDB. Scale: the language census is a tiny agg
    broadcast back to the corpus; the corpus side stays a scan + map-side
    filter with no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    census = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    n_min = census.agg(F.min("n_lang").alias("n_min"))
    rates = census.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.floor(
            256 * F.sqrt(F.col("n_min").cast("double") / F.col("n_lang"))
        )
        .cast("int")
        .alias("keep_buckets"),
    )
    b = _b256_spark("doc_id")
    return (
        d.join(F.broadcast(rates), "lang")
        .select("doc_id", "lang", "keep_buckets", b.alias("bucket"))
        .filter(F.col("bucket") < F.col("keep_buckets"))
    )


@register(
    "doc_rarity_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT({_NORM_DUCK}, ' ')) AS token
      FROM documents),
    t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    cnts AS (SELECT token, COUNT(*) AS cnt FROM t2 GROUP BY token),
    j AS (SELECT doc_id, cnt FROM t2 JOIN cnts USING (token))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(LENGTH(PRINTF('%b', cnt)) - 1) AS DOUBLE) / COUNT(*)
             AS mean_zipf,
           CAST(SUM(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS rare_frac
    FROM j GROUP BY doc_id
    """,
)
def doc_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rarity profile against the corpus's own unigram
    distribution — the language-model-free stand-in for a perplexity
    quality signal: mean Zipf bucket (floor(log2(corpus count)) of each
    token, LOW mean = rare vocabulary) and the fraction of tokens whose
    corpus count is <= 2.

    floor(log2(n)) is computed EXACTLY as binary-digit-count - 1 (Spark
    `conv(n,10,2)`, DuckDB `PRINTF('%b')`) — integer arithmetic, no libm
    log whose last-ulp could differ between engines.

    Scale: nothing occurrence-sized ever shuffles. The exploded token
    stream collapses map-side to unique (doc_id, token) pairs with an
    in-doc count `k` (r5 — natural text repeats tokens, so this is the
    shuffle-volume win the partial combine can't get on a (doc,token)
    key), corpus counts are a vocabulary-sized second agg over those
    pairs, the count join shuffles unique pairs only, and the per-doc
    stats weight by `k` (integer-exact, so values are identical to the
    per-occurrence formulation the oracle states). The pair table is
    PERSISTED (r7): it feeds the corpus-count branch AND the scoring
    join, and without the persist the corpus explode + pair shuffle
    replays for each — the same fix that took sibling
    `perplexity_bucket` from a 7.0 to a 1.1 sf1 ratio while this op,
    structurally identical, sat at 7.0."""
    d = load_table(spark, sf_dir, "documents")
    t2 = (
        d.select("doc_id", F.explode(F.split(F.expr(_NORM_SPARK), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    dt = managed_persist(
        t2.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("k"))
    )
    cnts = dt.groupBy("token").agg(F.sum("k").alias("cnt"))
    j = dt.join(cnts, "token").select("doc_id", "k", "cnt")
    zipf = F.length(F.conv(F.col("cnt").cast("string"), 10, 2)) - 1
    n_tok = F.sum("k")
    return j.groupBy("doc_id").agg(
        n_tok.cast("long").alias("n_tokens"),
        (F.sum(F.col("k") * zipf).cast("double") / n_tok).alias("mean_zipf"),
        (
            F.sum(F.when(F.col("cnt") <= 2, F.col("k")).otherwise(0)).cast("double")
            / n_tok
        ).alias("rare_frac"),
    )


@register(
    "corpus_mix_report",
    oracle=f"""
    WITH t AS (
      SELECT lang, source,
             LEN(LIST_FILTER(STRING_SPLIT({_NORM_DUCK}, ' '), x -> x <> ''))
               AS n_toks
      FROM documents),
    tot AS (SELECT COUNT(*) AS d_total, SUM(n_toks) AS t_total FROM t)
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS DOUBLE) / (SELECT d_total FROM tot) AS doc_share,
           CAST(SUM(n_toks) AS DOUBLE) / (SELECT t_total FROM tot) AS token_share
    FROM t GROUP BY lang, source
    """,
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix report per (language, source): document and token counts
    with their shares of the whole corpus — the table a pre-training
    data card is built from. One partial+final hash agg on the tiny
    (lang, source) key space plus a broadcast single-row total; shares
    are single IEEE divisions (deterministic across engines)."""
    d = load_table(spark, sf_dir, "documents")
    n_toks = F.size(
        F.filter(F.split(F.expr(_NORM_SPARK), " "), lambda x: x != "")
    )
    t = d.select("lang", "source", n_toks.alias("n_toks"))
    grouped = t.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
    )
    tot = t.agg(
        F.count(F.lit(1)).alias("d_total"), F.sum("n_toks").alias("t_total")
    )
    return grouped.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_docs").cast("double") / F.col("d_total")).alias("doc_share"),
        (F.col("n_tokens").cast("double") / F.col("t_total")).alias("token_share"),
    )


@register(
    "corpus_shuffle",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CAST({_B256_DUCK.format(hex=_HEX, key='doc_id')} AS INT) % 8
               AS shard,
             MD5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents)
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
                AS BIGINT) AS pos
    FROM s
    """,
)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle of the corpus into training shards:
    shard = content-addressed md5 bucket mod 8, position within shard =
    rank by the md5 hex of the key. This is the reproducible
    "shuffled training order" manifest a pre-training run needs —
    re-runs, resumes and multi-cluster writers agree on the exact order
    with zero coordination, unlike rand()-based shuffles.

    Scale: one narrow shuffle on the shard key (shard count is chosen
    for the cluster, not the data), then an in-partition sort per shard
    — each shard's window evaluates independently on one executor
    partition. No global ordering bottleneck: position is per-shard, so
    no single-partition window exists at any scale."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    s = d.select(
        "doc_id",
        (_b256_spark("doc_id") % 8).alias("shard"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return s.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
    )


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST({_B256_DUCK.format(hex=_HEX, key='doc_id')} AS INT) % 8
               AS shard,
             MD5(CAST(doc_id AS VARCHAR)) AS h,
             CAST(LEN(LIST_FILTER(STRING_SPLIT({_NORM_DUCK}, ' '),
                                  x -> x <> '')) AS BIGINT) AS n_toks
      FROM documents),
    c AS (
      SELECT doc_id, shard, n_toks,
             SUM(n_toks) OVER (PARTITION BY shard ORDER BY h, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT doc_id, shard, n_toks,
           CAST((cum - n_toks) // 512 AS BIGINT) AS seq_id,
           CAST((cum - n_toks) % 512 AS BIGINT) AS seq_offset
    FROM c
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget sequence packing: documents are laid out in the
    deterministic per-shard shuffle order (same content-addressed order
    as `corpus_shuffle`) and concatenated into 512-token training
    sequences — each doc is assigned the sequence its first token lands
    in (seq_id) and its offset within it. This is the packing manifest
    that turns a document corpus into fixed-length training examples
    without a driver-side loop: integer running sum, floor-div, mod —
    exact on both engines.

    Scale: identical shape to `corpus_shuffle` — one shuffle on the
    shard key, then an independent in-partition running sum per shard.
    Token counting is the same normalized whitespace tokenizer as
    `corpus_mix_report` (map-side, codegen)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    n_toks = F.size(
        F.filter(F.split(F.expr(_NORM_SPARK), " "), lambda x: x != "")
    ).cast("long")
    t = d.select(
        "doc_id",
        (_b256_spark("doc_id") % 8).alias("shard"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        n_toks.alias("n_toks"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.select("doc_id", "shard", "n_toks", F.sum("n_toks").over(w).alias("cum"))
    start = F.col("cum") - F.col("n_toks")
    return c.select(
        "doc_id",
        "shard",
        "n_toks",
        F.expr("(cum - n_toks) div 512").cast("long").alias("seq_id"),
        (start % 512).cast("long").alias("seq_offset"),
    )


@register(
    "embed_norm_quantize",
    oracle="""
    WITH s AS (
      SELECT vec_id, label, embedding,
             SQRT(LIST_REDUCE(
               LIST_PREPEND(CAST(0 AS DOUBLE),
                 LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a, b) -> a + b)) AS nrm
      FROM embeddings)
    SELECT vec_id, label,
           CASE WHEN nrm = 0 THEN 'ZERO'
                ELSE ARRAY_TO_STRING(
                  LIST_TRANSFORM(embedding,
                    x -> CAST(FLOOR(CAST(x AS DOUBLE) / nrm * 127.0) AS INT)), ',')
           END AS q8,
           CAST(FLOOR(nrm * 1000000.0) AS BIGINT) AS norm_micros
    FROM s
    """,
)
def embed_norm_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize embeddings and int8-quantize (floor(x/||x|| * 127))
    — the storage-compression pass before ANN indexing. Left-fold
    sum-of-squares (bit-exact against DuckDB LIST_REDUCE), quantized
    vector rendered as a joined string so the driver canonicalizer only
    sees hashable cells. Map-side HOFs, no shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    sumsq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    withn = e.select("vec_id", "label", "embedding", F.sqrt(sumsq).alias("nrm"))
    q8 = F.array_join(
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") / F.col("nrm") * 127.0).cast("int"),
        ),
        ",",
    )
    return withn.select(
        "vec_id",
        "label",
        F.when(F.col("nrm") == 0, "ZERO").otherwise(q8).alias("q8"),
        F.floor(F.col("nrm") * 1000000.0).alias("norm_micros"),
    )


# Shared quality-gate SQL fragment (the gopher `passes` predicate over a
# CTE exposing toks + alpha_chars), reused by the end-to-end pipeline.
_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in _STOP_EN)
_PASSES_SQL = (
    "(LEN(toks) BETWEEN 20 AND 1000)"
    " AND (CAST(alpha_chars AS DOUBLE) / LEN(toks) BETWEEN 2.0 AND 12.0)"
    " AND (CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) >= 0.2)"
    f" AND (LEN(LIST_FILTER(toks, x -> x IN ({_STOP_LIST_SQL}))) >= 1)"
)

# Production-length decontamination grams (n=13, the WMDP/GPT-3-style
# setting): long enough that only near-verbatim leaks match — the n=3
# demo setting of `decontaminate_ngram` flags template-similar synthetic
# docs almost universally, which is the wrong behavior for a DROP stage.
_DECONTAM_N = 13
# Grams are hashed to 60-bit longs INSIDE the transform (the engine's
# hash60, identical in DuckDB) so the containment join explodes,
# broadcasts, and compares 8-byte keys instead of ~80-char strings;
# a collision would affect both engines identically.
_NG13_SPARK = (
    f"case when size(toks) >= {_DECONTAM_N} then "
    f"transform(sequence(1, size(toks) - {_DECONTAM_N - 1}), "
    f"i -> cast(conv(substring(md5(cast(concat_ws(' ', slice(toks, i, {_DECONTAM_N})) as binary)), 1, 15), 16, 10) as bigint)) "
    "else array() end"
)
_NG13_DUCK = (
    f"LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - {_DECONTAM_N - 2}, 1)), "
    f"i -> CAST(CONCAT('0x', SUBSTR(MD5(ARRAY_TO_STRING(toks[i:i+{_DECONTAM_N - 1}], ' ')), 1, 15)) AS BIGINT))"
)


@register(
    "pipeline_end_to_end",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, text,
             STRING_SPLIT({_NORM_DUCK}, ' ') AS toks,
             LENGTH(REPLACE({_NORM_DUCK}, ' ', '')) AS alpha_chars
      FROM documents),
    q AS (SELECT doc_id, lang, text, toks FROM t WHERE {_PASSES_SQL}),
    dd AS (
      SELECT doc_id, lang, toks FROM q
      QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY MD5(text))),
    bench AS (
      SELECT DISTINCT UNNEST({_NG13_DUCK}) AS gram
      FROM t WHERE doc_id % 50 = 0),
    tri AS (
      SELECT doc_id, UNNEST({_NG13_DUCK}) AS gram
      FROM dd WHERE doc_id % 50 <> 0),
    contaminated AS (
      SELECT DISTINCT tri.doc_id FROM tri JOIN bench USING (gram)),
    clean AS (
      SELECT doc_id, lang, toks FROM dd
      WHERE doc_id % 50 <> 0
        AND doc_id NOT IN (SELECT doc_id FROM contaminated))
    SELECT doc_id, lang, CAST(LEN(toks) AS BIGINT) AS n_tokens
    FROM clean
    WHERE {_B16_DUCK.format(hex=_HEX, key='doc_id')} < 13
    """,
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline, one logical plan end-to-end:
    Gopher quality gate → exact dedup (min doc_id per content hash) →
    benchmark decontamination (trigram containment vs the held-out set)
    → deterministic train split → per-doc token counts for packing.

    This is the flagship composition proof: every stage reuses the exact
    operator definitions registered individually (same normalize chain,
    same gates, same content hash, same trigram fragment, same md5-nibble
    split), and Catalyst fuses them — the quality gate and token counting
    stay map-side over one scan, dedup is one content-hash window,
    decontamination is a broadcast containment join (the corpus never
    shuffles for it), and the split is a pushed-down filter. At 100 TB
    this whole pipeline is two corpus shuffles (dedup hash, contamination
    doc_id dedup) plus map-side everything else."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    norm = F.expr(_NORM_SPARK)
    toks = F.split(norm, " ")
    staged = d.select(
        "doc_id", "lang", "text", toks.alias("toks"),
        F.length(F.replace(norm, F.lit(" "), F.lit(""))).alias("alpha_chars"),
    )
    n = F.size(F.col("toks"))
    awl = F.col("alpha_chars").cast("double") / n
    div = F.size(F.array_distinct(F.col("toks"))).cast("double") / n
    stop = F.size(F.filter(F.col("toks"), lambda t: t.isin(*_STOP_EN)))
    passes = (
        (n >= 20) & (n <= 1000)
        & (awl >= 2.0) & (awl <= 12.0)
        & (div >= 0.2)
        & (stop >= 1)
    )
    q = staged.filter(passes)
    w = Window.partitionBy(F.md5(F.col("text").cast("binary")))
    dd = q.withColumn("min_id", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("min_id")
    ).select("doc_id", "lang", "toks")
    bench = (
        staged.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode_outer(F.expr(_NG13_SPARK)).alias("gram"))
        .distinct()
    )
    train = dd.filter(F.col("doc_id") % 50 != 0)
    contaminated = (
        train.select("doc_id", F.explode_outer(F.expr(_NG13_SPARK)).alias("gram"))
        .join(F.broadcast(bench), "gram")
        .select("doc_id")
        .distinct()
    )
    clean = train.join(contaminated, "doc_id", "left_anti")
    return clean.filter(_b16_spark("doc_id") < 13).select(
        "doc_id", "lang", F.size("toks").cast("long").alias("n_tokens")
    )


@register(
    "split_leakage_report",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, STRING_SPLIT({_NORM_DUCK}, ' ') AS toks FROM documents),
    tagged AS (
      SELECT doc_id, toks,
             CASE WHEN {_B16_DUCK.format(hex=_HEX, key='doc_id')} < 13 THEN 'train'
                  WHEN {_B16_DUCK.format(hex=_HEX, key='doc_id')} < 15 THEN 'val'
                  ELSE 'test' END AS split
      FROM t),
    tr AS (SELECT DISTINCT UNNEST({_NG13_DUCK}) AS gram
           FROM tagged WHERE split = 'train'),
    vg AS (SELECT doc_id, UNNEST(LIST_DISTINCT({_NG13_DUCK})) AS gram
           FROM tagged WHERE split = 'val')
    SELECT doc_id, COUNT(*) AS n_leaked_grams
    FROM vg JOIN tr USING (gram)
    GROUP BY doc_id
    """,
)
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split leakage audit: every val-split document that shares a
    verbatim 13-gram with ANY train-split document, with the count of
    leaked distinct grams — the QA table a training run reads before
    trusting its validation loss. Reuses the deterministic md5-nibble
    split of `train_val_split` and the hashed 13-gram fragment of
    `pipeline_end_to_end`, so the audit measures exactly the split and
    grams the pipeline ships.

    Scale: unlike benchmark decontamination (tiny broadcast side), BOTH
    sides here are corpus-proportional (train ~81%, val ~12%), so the
    gram join carries no broadcast pin — it is a hash join on 8-byte
    keys, linear in corpus size, and AQE picks the physical strategy."""
    d = load_table(spark, sf_dir, "documents")
    b = _b16_spark("doc_id")
    tagged = d.select(
        "doc_id",
        F.split(F.expr(_NORM_SPARK), " ").alias("toks"),
        F.when(b < 13, "train").when(b < 15, "val").otherwise("test").alias("split"),
    )
    tr = (
        tagged.filter(F.col("split") == "train")
        .select(F.explode_outer(F.expr(_NG13_SPARK)).alias("gram"))
        .distinct()
    )
    vg = tagged.filter(F.col("split") == "val").select(
        "doc_id", F.explode(F.array_distinct(F.expr(_NG13_SPARK))).alias("gram")
    )
    return vg.join(tr, "gram").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_leaked_grams")
    )


@register(
    "perplexity_bucket",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, UNNEST(STRING_SPLIT({_NORM_DUCK}, ' ')) AS token
      FROM documents),
    dt AS (SELECT doc_id, lang, token, COUNT(*) AS k
           FROM tok WHERE token <> '' GROUP BY doc_id, lang, token),
    cnts AS (SELECT token, CAST(SUM(k) AS BIGINT) AS cnt FROM dt GROUP BY token),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM cnts),
    ds AS (
      SELECT doc_id, lang, CAST(SUM(k) AS BIGINT) AS n_tokens,
             CAST(SUM(k * ((LENGTH(PRINTF('%b', total)) - 1)
                           - (LENGTH(PRINTF('%b', cnt)) - 1))) AS DOUBLE)
               / SUM(k) AS mean_surprisal
      FROM dt JOIN cnts USING (token) CROSS JOIN tot
      GROUP BY doc_id, lang),
    cut AS (
      SELECT lang,
             vs[CAST((LEN(vs) + 2) // 3 AS INT)] AS c1,
             vs[CAST((2 * LEN(vs) + 2) // 3 AS INT)] AS c2
      FROM (SELECT lang, LIST_SORT(LIST(mean_surprisal)) AS vs
            FROM ds
            WHERE {_B16_DUCK.format(hex=_HEX, key='doc_id')} = 0
            GROUP BY lang))
    SELECT doc_id, ds.lang AS lang, n_tokens, mean_surprisal,
           CASE WHEN c1 IS NULL THEN 'unsampled'
                WHEN mean_surprisal <= c1 THEN 'head'
                WHEN mean_surprisal <= c2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM ds LEFT JOIN cut USING (lang)
    """,
)
def perplexity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing: score every document by its mean
    unigram surprisal under the corpus's own MLE unigram model, then
    assign head/middle/tail terciles per language — the partition CCNet
    uses to pick "looks like reference text" training data. (The
    reference, rigoiot/node-cdc-nats, is transport-only — lib/nats.js has
    no scoring ops; this extends the engine per the LLM-pipeline north
    star, like the rest of this module.)

    Engine-exact arithmetic: surprisal of a token with corpus count c is
    floor(log2(total)) - floor(log2(c)) — computed as binary-digit-count
    differences (integer, no libm), so the per-doc mean is an exact
    integer sum followed by ONE IEEE division, identical in Spark and
    DuckDB.

    Scale (the part naive tercile bucketing gets wrong): NTILE(3) OVER
    (PARTITION BY lang ...) would sort each language's documents inside a
    single task — a per-lang global-order bottleneck at 100 TB. Instead
    the tercile CUTOFFS are estimated from a deterministic md5-nibble
    sample of documents (b16(doc_id) == 0, 1/16 here; dial the nibble
    depth down for a 100 TB corpus) — a tiny per-lang sorted array — and
    bucket assignment is a broadcast join + map-side CASE over the full
    corpus. Languages absent from the sample get 'unsampled' (the honest
    answer; CCNet computes cutoffs on a held-out sample too). The corpus
    unigram-count pipeline is the same unique-(doc,token)-pair shuffle as
    `doc_rarity_score`, and the pair table is PERSISTED (spill-safe):
    the cutoff branch needs the full-corpus unigram counts, so an
    unpersisted plan replays the explode + pair shuffle over the whole
    corpus a second time — at the sf1-equivalent measurement the persist
    halves wall-clock (7.0 s → 3.7 s, 10× ratio ~2.5). Persisting the
    per-doc SCORE table instead is strictly slower (measured: it blocks
    the scan-level sample pushdown the cutoff branch enjoys). The
    surprisal digit-count expressions are computed once per VOCAB entry
    (on the token-count table, r6) rather than once per (doc,token)
    pair — the pair table is orders of magnitude wider than the
    vocabulary, and the string-conv log2 was its dominant per-row
    cost."""
    d = load_table(spark, sf_dir, "documents")
    t2 = d.select(
        "doc_id", "lang", F.explode(F.split(F.expr(_NORM_SPARK), " ")).alias("token")
    ).filter(F.col("token") != "")
    # The unique-(doc,token) pair table feeds the corpus unigram model
    # AND (twice) the per-doc scorer — the cutoff branch needs the FULL
    # corpus counts, so without a persist the explode + pair shuffle
    # replays over the whole corpus for it. Persisting dt halves the
    # sf1-equivalent cost (measured r6: 7.0 s → ~4.4 s); spill-safe.
    dt = managed_persist(
        t2.groupBy("doc_id", "lang", "token").agg(F.count(F.lit(1)).alias("k"))
    )

    def zipf(c: F.Column) -> F.Column:
        return F.length(F.conv(c.cast("string"), 10, 2)) - 1

    # Per-token surprisal digit-count evaluated on the VOCAB table (one
    # row per distinct token), not on the much wider (doc,token) pair
    # table after the join — same values, far fewer string-conv calls.
    cnts = dt.groupBy("token").agg(F.sum("k").alias("cnt"))
    cnts = cnts.select("token", "cnt", zipf(F.col("cnt")).alias("zc"))
    tot = cnts.agg(zipf(F.sum("cnt")).alias("ztot"))
    j = dt.join(cnts, "token").crossJoin(F.broadcast(tot))
    s = F.col("ztot") - F.col("zc")
    n_tok = F.sum("k")
    ds = j.groupBy("doc_id", "lang").agg(
        n_tok.cast("long").alias("n_tokens"),
        (F.sum(F.col("k") * s).cast("double") / n_tok).alias("mean_surprisal"),
    )
    vs = F.sort_array(F.collect_list("mean_surprisal"))
    cut = (
        ds.filter(_b16_spark("doc_id") == 0)
        .groupBy("lang")
        .agg(vs.alias("vs"))
        .select(
            "lang",
            F.element_at("vs", ((F.size("vs") + 2) / 3).cast("int")).alias("c1"),
            F.element_at("vs", ((F.size("vs") * 2 + 2) / 3).cast("int")).alias("c2"),
        )
    )
    bucket = (
        F.when(F.col("c1").isNull(), "unsampled")
        .when(F.col("mean_surprisal") <= F.col("c1"), "head")
        .when(F.col("mean_surprisal") <= F.col("c2"), "middle")
        .otherwise("tail")
    )
    return ds.join(F.broadcast(cut), "lang", "left").select(
        "doc_id", "lang", "n_tokens", "mean_surprisal", bucket.alias("ppl_bucket")
    )


@register(
    "decontaminate_containment",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT({_NORM_DUCK}, ' ') AS t FROM documents),
    g AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id, UNNEST({_TRIGRAMS_DUCK.format(toks='t')}) AS gram
        FROM toks)),
    bench AS (SELECT doc_id AS bench_doc_id, gram FROM g WHERE doc_id % 50 = 0),
    bsize AS (SELECT bench_doc_id, COUNT(*) AS bench_ngrams
              FROM bench GROUP BY bench_doc_id),
    train AS (SELECT doc_id AS train_doc_id, gram FROM g WHERE doc_id % 50 <> 0),
    shared AS (
      SELECT train_doc_id, bench_doc_id, COUNT(*) AS shared_ngrams
      FROM train JOIN bench USING (gram)
      GROUP BY train_doc_id, bench_doc_id)
    SELECT train_doc_id, bench_doc_id,
           CAST(shared_ngrams AS BIGINT) AS shared_ngrams,
           CAST(bench_ngrams AS BIGINT) AS bench_ngrams,
           CAST(shared_ngrams AS DOUBLE) / bench_ngrams AS containment,
           CAST(shared_ngrams AS DOUBLE) / bench_ngrams >= 0.5 AS contaminated
    FROM shared JOIN bsize USING (bench_doc_id)
    """,
)
def decontaminate_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination by n-gram containment: for every (train doc,
    benchmark doc) pair sharing any gram, the fraction of the benchmark
    doc's distinct trigrams present in the train doc, flagged at
    containment >= 0.5 — the overlap-fraction criterion (GPT-3-appendix
    style) that
    catches paraphrased/partial benchmark leaks `decontaminate_ngram`'s
    any-single-gram flag would either miss (if grams are perturbed) or
    over-fire on (one boilerplate gram). Containment is computed EXACTLY;
    MinHash banding is deliberately not used here because banding recall
    tracks Jaccard, and a small benchmark doc fully contained in a long
    train doc has high containment but near-zero Jaccard — the exact
    miss-case that matters.

    Scale: the benchmark side (every 50th doc here; the real
    benchmark suite in production) is small and broadcast — the corpus
    never shuffles on gram. The only corpus-sized shuffle is the count
    keyed by (train_doc, bench_doc), whose cardinality is bounded by
    actual overlap, not the corpus x benchmark cross product. Division
    is a single IEEE op on integer inputs — engine-exact."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", F.split(F.expr(_NORM_SPARK), " ").alias("toks"))
    # Plain explode (not explode_outer): a doc with < 3 tokens must
    # contribute ZERO gram rows, exactly like the oracle's UNNEST —
    # an outer-explode NULL row would inflate that doc's bench_ngrams.
    g = toked.select(
        "doc_id",
        F.explode(F.expr(_TRIGRAMS_SPARK.format(toks="toks"))).alias("gram"),
    ).distinct()
    bench = g.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_doc_id"), "gram"
    )
    bsize = bench.groupBy("bench_doc_id").agg(
        F.count(F.lit(1)).alias("bench_ngrams")
    )
    train = g.filter(F.col("doc_id") % 50 != 0).select(
        F.col("doc_id").alias("train_doc_id"), "gram"
    )
    shared = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("train_doc_id", "bench_doc_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    cont = F.col("shared_ngrams").cast("double") / F.col("bench_ngrams")
    return shared.join(F.broadcast(bsize), "bench_doc_id").select(
        "train_doc_id",
        "bench_doc_id",
        F.col("shared_ngrams").cast("long").alias("shared_ngrams"),
        F.col("bench_ngrams").cast("long").alias("bench_ngrams"),
        cont.alias("containment"),
        (cont >= 0.5).alias("contaminated"),
    )


@register(
    "bpe_pair_stats",
    oracle=f"""
    WITH tok AS (
      SELECT UNNEST(STRING_SPLIT({_NORM_DUCK}, ' ')) AS token FROM documents),
    vocab AS (
      SELECT token, COUNT(*) AS cnt FROM tok WHERE token <> '' GROUP BY token),
    pairs AS (
      SELECT pair, cnt FROM (
        SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(token)),
                                     i -> SUBSTR(token, CAST(i AS INT), 2))) AS pair,
               cnt
        FROM vocab)),
    agg AS (
      SELECT pair,
             CAST(SUM(cnt) AS BIGINT) AS pair_count,
             CAST(COUNT(*) AS BIGINT) AS n_token_types
      FROM pairs GROUP BY pair)
    SELECT pair, pair_count, n_token_types
    FROM agg ORDER BY pair_count DESC, pair LIMIT 50
    """,
)
def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-induction statistics: the top-50 adjacent character pairs
    across the corpus weighted by token frequency — exactly the candidate
    ranking BPE's first merge step computes (and re-computes per merge;
    this op is that inner loop as one query). `pair_count` is the number
    of corpus occurrences of the pair inside a token; `n_token_types` the
    number of distinct token types containing it.

    Scale: the ONLY corpus-sized stage is the token-frequency aggregation
    (identical shuffle to `corpus_vocab_stats`: explode collapses
    map-side via partial aggregation). Pair explosion and pair counting
    run over the VOCABULARY — orders of magnitude smaller than the corpus
    — and the top-50 is TakeOrderedAndProject, never a global sort. The
    (count desc, pair asc) tiebreak makes the LIMIT deterministic on both
    engines."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.expr(_NORM_SPARK), " ")).alias("token")
    ).filter(F.col("token") != "")
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    # Gate on length >= 2: Spark's sequence(1, 0) is DESCENDING (yields
    # [1, 0]), so an unguarded expression double-counts 1-char tokens as
    # their own "pair" — the same trap _BIGRAMS_SPARK guards against.
    pairs = vocab.select(
        F.explode(
            F.expr(
                "case when length(token) >= 2 then "
                "transform(sequence(1, length(token) - 1), i -> substr(token, i, 2)) "
                "else array() end"
            )
        ).alias("pair"),
        "cnt",
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("cnt").cast("long").alias("pair_count"),
        F.count(F.lit(1)).cast("long").alias("n_token_types"),
    )
    return agg.orderBy(F.col("pair_count").desc(), "pair").limit(50)


@register(
    "tfidf_topk_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT({_NORM_DUCK}, ' ')) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok WHERE token <> '' GROUP BY doc_id, token),
    df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
    scored AS (
      SELECT doc_id, token, tf,
             CAST(tf * ((LENGTH(PRINTF('%b', n_docs)) - 1)
                        - (LENGTH(PRINTF('%b', df)) - 1)) AS BIGINT) AS score
      FROM tf JOIN df USING (token) CROSS JOIN nd)
    SELECT doc_id, token, tf, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, tf DESC, token) AS BIGINT)
             AS rnk
    FROM scored
    QUALIFY rnk <= 3
    """,
)
def tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by integer TF-IDF — the
    keyword extraction a corpus browser / topic audit runs over training
    data. IDF is the binary-digit-count surprisal (floor(log2 n_docs) −
    floor(log2 df)) — INTEGER, so score = tf·idf is exact on both engines
    with no libm anywhere (same trick as `perplexity_bucket`). Scale:
    explode → partial+final (doc, token) hash agg → df as a
    token-partitioned COUNT window over that one tf relation → per-doc
    row_number window. Three key-partitioned data shuffles (pair agg,
    token window, doc window) + a 1-row scalar broadcast (n_docs from a
    plain documents count, not a tf replay) — the tf relation is
    computed ONCE (the earlier groupBy-df + join-back formulation
    re-executed the corpus explode for the df side), no global sort
    anywhere, and each window's per-key state is one token's pair rows /
    one doc's terms."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    tok = d.select(
        "doc_id", F.explode(F.split(F.expr(_NORM_SPARK), " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # df as a token-partitioned WINDOW over tf, not a groupBy+join-back:
    # the join formulation re-executes the corpus explode + pair shuffle
    # for the df side (measured ~1.4 s of the op's sf0.1 cost); the window
    # reuses the one materialized tf relation for the same token-keyed
    # exchange. n_docs likewise comes from a plain documents count (docs
    # with a non-empty normalized text == docs contributing ≥1 token —
    # same value as COUNT(DISTINCT doc_id) over tf, without replaying the
    # explode a third time).
    df_w = Window.partitionBy("token")
    nd = d.filter(F.expr(_NORM_SPARK) != "").agg(
        F.count(F.lit(1)).alias("n_docs")
    )

    def digits2(c: F.Column) -> F.Column:
        return F.length(F.conv(c.cast("string"), 10, 2)) - 1

    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(df_w))
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id", "token", "tf",
            (F.col("tf") * (digits2(F.col("n_docs")) - digits2(F.col("df"))))
            .cast("long")
            .alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("tf").desc(), "token"
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


# Fixed classifier weights — literals on both engines so the linear
# score is ONE identical IEEE expression tree (no exp/log: a logistic
# link would differ in the last ulp across libm implementations; the
# decision boundary only needs the linear score's sign).
_QCW_STOP, _QCW_DIGIT, _QCW_AVGLEN, _QCW_BIAS = 3.0, 2.0, 0.05, 0.5


@register(
    "quality_classifier_linear",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             CAST(LEN(LIST_FILTER(STRING_SPLIT({_NORM_DUCK}, ' '),
                                  x -> x <> '')) AS DOUBLE) AS n_toks,
             CAST(LEN(LIST_FILTER(STRING_SPLIT({_NORM_DUCK}, ' '),
                                  x -> x IN ('the','a','of','and','to','in','is','it','for','on')))
               AS DOUBLE) AS n_stop,
             CAST(LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS DOUBLE)
               AS n_digit,
             CAST(LENGTH(text) AS DOUBLE) AS n_chars,
             CAST(LENGTH(REPLACE({_NORM_DUCK}, ' ', '')) AS DOUBLE) AS n_tokchars
      FROM documents)
    SELECT doc_id,
           (({_QCW_STOP} * (n_stop / NULLIF(n_toks, 0))
             - {_QCW_DIGIT} * (n_digit / NULLIF(n_chars, 0)))
            + {_QCW_AVGLEN} * (n_tokchars / NULLIF(n_toks, 0))) - {_QCW_BIAS}
             AS quality_logit,
           (({_QCW_STOP} * (n_stop / NULLIF(n_toks, 0))
              - {_QCW_DIGIT} * (n_digit / NULLIF(n_chars, 0)))
             + {_QCW_AVGLEN} * (n_tokchars / NULLIF(n_toks, 0)))
            - {_QCW_BIAS} > 0 AS keep
    FROM feats
    """,
)
def quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight linear quality classifier (fastText-style gate, the
    shape CCNet/LLaMA-style pipelines apply after rule filters): three
    engineered features — stopword ratio, digit-character ratio, mean
    token length — closed with literal weights into one linear logit and
    a sign decision. Weights live in `_QCW_*`; a trained model would
    broadcast its coefficient vector the same way.

    Engine-exact: every feature is count/count (single IEEE division,
    NULLIF-guarded), and the logit is ONE parenthesized expression tree
    evaluated identically in Spark and DuckDB — deliberately NO
    exp/sigmoid, whose libm rounding differs across engines; the
    decision boundary only needs the logit's sign. Scale: pure map-side
    projection over built-ins — no shuffle, whole-stage codegen, linear
    at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.expr(_NORM_SPARK)
    toks = F.filter(F.split(norm, " "), lambda x: x != "")
    stop_list = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
    n_toks = F.size(toks).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin(*stop_list))
    ).cast("double")
    n_digit = F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")).cast("double")
    n_chars = F.length(F.col("text")).cast("double")
    n_tokchars = F.length(F.regexp_replace(norm, " ", "")).cast("double")
    logit = (
        (
            F.lit(_QCW_STOP) * (n_stop / F.nullif(n_toks, F.lit(0.0)))
            - F.lit(_QCW_DIGIT) * (n_digit / F.nullif(n_chars, F.lit(0.0)))
        )
        + F.lit(_QCW_AVGLEN) * (n_tokchars / F.nullif(n_toks, F.lit(0.0)))
    ) - F.lit(_QCW_BIAS)
    return d.select(
        "doc_id",
        logit.alias("quality_logit"),
        (logit > 0).alias("keep"),
    )


_CHUNK, _STRIDE = 256, 192  # 64-char overlap between adjacent chunks


@register(
    "doc_chunk_overlap",
    oracle=f"""
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(i * {_STRIDE} AS BIGINT) AS chunk_start,
           SUBSTR(text, CAST(i * {_STRIDE} + 1 AS INT), {_CHUNK}) AS chunk_text,
           CAST(LENGTH(SUBSTR(text, CAST(i * {_STRIDE} + 1 AS INT), {_CHUNK}))
                AS BIGINT) AS chunk_len
    FROM documents,
         UNNEST(GENERATE_SERIES(0,
             CAST(FLOOR(CAST(GREATEST(LENGTH(text) - 1, 0) AS DOUBLE)
                        / {_STRIDE}) AS BIGINT))) AS t(i)
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking ({_CHUNK}-char chunks, {_STRIDE}-char
    stride → 64-char overlap) with stable (doc_id, chunk_id) keys — the
    segmentation step an embedding/retrieval pipeline runs before
    vectorizing a corpus, sized so no boundary sentence is lost to a hard
    split. Chunk boundaries are pure character arithmetic (identical on
    both engines); the empty document degenerates to one empty chunk on
    both. Scale: map-side `sequence` + `explode` + `substring` — zero
    shuffles, whole-stage codegen, output rows ≈ chars/stride. The
    chunk_id is derivable from (doc_id, chunk_start), so downstream
    embedding jobs can join chunk vectors back without a synthetic key."""
    d = load_table(spark, sf_dir, "documents")
    last = F.floor(
        F.greatest(F.length("text") - 1, F.lit(0)).cast("double") / _STRIDE
    ).cast("int")
    return (
        d.select("doc_id", "text", F.explode(F.sequence(F.lit(0), last)).alias("i"))
        .select(
            "doc_id",
            F.col("i").cast("long").alias("chunk_id"),
            (F.col("i") * _STRIDE).cast("long").alias("chunk_start"),
            F.substring(F.col("text"), F.col("i") * _STRIDE + 1, _CHUNK).alias(
                "chunk_text"
            ),
            F.length(
                F.substring(F.col("text"), F.col("i") * _STRIDE + 1, _CHUNK)
            ).cast("long").alias("chunk_len"),
        )
    )


def _z_interleave_sql(x: str, y: str, bits: int = 8) -> str:
    """Bit-interleaved Z-value of two non-negative ints (low `bits` bits
    each): x's bit i lands at 2i, y's at 2i+1. Built from &, * and +
    only — the operator set Spark SQL and DuckDB share verbatim, so ONE
    generated expression string serves both engines (shifts are *2^k
    multiplications; extraction is CAST(v/2^i) & 1)."""
    terms = []
    for i in range(bits):
        terms.append(f"((CAST(FLOOR(({x}) / {1 << i}) AS BIGINT) & 1) * {1 << (2 * i)})")
        terms.append(f"((CAST(FLOOR(({y}) / {1 << i}) AS BIGINT) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


_ZEXPR = _z_interleave_sql("l_partkey % 256", "l_suppkey % 256")


@register(
    "layout_zorder",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST({_ZEXPR} AS BIGINT) AS zval
    FROM lineitem
    """,
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve value over (partkey, suppkey) low bytes —
    THE multi-dimensional layout key for a 100 TB fact table that is
    range-filtered on more than one column: writing the table
    `repartitionByRange(zval).sortWithinPartitions(zval)` clusters rows
    so parquet row-group min/max stats prune scans on EITHER dimension
    (a single-column sort prunes only its own column). Measured
    (tests/test_plan_shape.py::test_layout_zorder_prunes_2d_box_queries):
    a small 2-D box predicate overlaps ~17% of z-ordered row groups vs
    ~97% under a single-column sort — a ~5.7× scan reduction. This op
    computes the key; the write pattern is `sink_compacted`'s with zval
    as the range key. Engine-exact: bit extraction is integer divide + AND + 
    multiply — one generated expression string evaluated verbatim by
    both engines, map-side, no shuffle in the key computation itself."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.expr(_ZEXPR).cast("long").alias("zval"),
    )


@register(
    "source_dup_rate",
    oracle="""
    WITH per_hash AS (
      SELECT source, MD5(text) AS content_hash, COUNT(*) AS n_copies
      FROM documents GROUP BY source, MD5(text)
    )
    SELECT source,
           CAST(SUM(n_copies) AS BIGINT) AS n_docs,
           COUNT(*) AS n_unique,
           -- int64/int64 double division: both engines round the exact
           -- rational to the same nearest double.
           CAST(SUM(n_copies) - COUNT(*) AS DOUBLE)
             / CAST(SUM(n_copies) AS DOUBLE) AS dup_rate
    FROM per_hash GROUP BY source ORDER BY source
    """,
)
def source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate telemetry: how much of each ingest
    source is verbatim copies. This is the governance report a corpus
    team reads before re-weighting sources (a 40%-dup crawl slice gets
    downsampled; a 0%-dup curated slice doesn't) — the reporting twin of
    `dedup_exact`, which drops the copies this op merely measures.

    Scale: two-level dedup-then-count on (source, md5(text)) — one
    shuffle keyed by the composite, partial aggregation collapses
    copies map-side first, and the second aggregate runs on unique
    hashes only (|sources| final groups). No COUNT(DISTINCT) Expand, no
    Python, and the md5 is computed once per row in the scan projection.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.md5(F.col("text").cast("binary")).alias("content_hash")
    )
    per_hash = d.groupBy("source", "content_hash").agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    n_docs = F.sum("n_copies")
    return (
        per_hash.groupBy("source")
        .agg(
            n_docs.alias("n_docs"),
            F.count(F.lit(1)).alias("n_unique"),
            (
                (n_docs - F.count(F.lit(1))).cast("double")
                / n_docs.cast("double")
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@register(
    "ngram_novelty_curve",
    oracle=f"""
    WITH toks AS (
      SELECT CAST(STRPOS('{_HEX}',
                   SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INTEGER)
               AS batch,
             STRING_SPLIT({{norm}}, ' ') AS t
      FROM documents),
    g0 AS (SELECT batch, UNNEST({{tri}}) AS gram FROM toks),
    g AS (SELECT DISTINCT batch, gram FROM g0),
    firsts AS (SELECT gram, MIN(batch) AS first_b FROM g GROUP BY gram),
    per_batch AS (SELECT batch, COUNT(*) AS n_distinct FROM g GROUP BY batch),
    novel AS (SELECT first_b, COUNT(*) AS n_new FROM firsts GROUP BY first_b)
    SELECT p.batch, p.n_distinct,
           COALESCE(n.n_new, CAST(0 AS BIGINT)) AS n_new,
           CAST(COALESCE(n.n_new, 0) AS DOUBLE) / CAST(p.n_distinct AS DOUBLE)
             AS novelty_rate
    FROM per_batch p LEFT JOIN novel n ON n.first_b = p.batch
    ORDER BY p.batch
    """.format(norm=_NORM_DUCK, tri=_TRIGRAMS_DUCK.format(toks="t")),
)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ingest-batch n-gram novelty: for each batch (md5-nibble of
    doc_id — the same deterministic 16-way ingest split the incremental
    dedup ops use), how many distinct trigrams appear at all and how many
    appear for the FIRST time corpus-wide. The novelty rate's decay is
    the saturation curve a data-acquisition team reads to decide when a
    source is mined out — the measurable version of "new data is adding
    nothing new".

    Plan: explode trigrams once, dedup (gram, batch) — one shuffle on the
    composite key with map-side partial dedup — then gram-keyed MIN and
    two 16-row censuses joined batch-to-first_b. The wide shuffles are
    both linear in distinct-gram volume; nothing is collected. At 100 TB
    the (gram, batch) dedup dominates and partitions by gram hash — the
    same layout the MIN aggregate wants, so Catalyst reuses one Exchange
    for both."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select(
        _b16_spark("doc_id").alias("batch"),
        F.split(F.expr(_NORM_SPARK), " ").alias("toks"),
    )
    gb = (
        toked.select(
            "batch",
            F.explode(F.expr(_TRIGRAMS_SPARK.format(toks="toks"))).alias("gram"),
        )
        .distinct()
    )
    firsts = gb.groupBy("gram").agg(F.min("batch").alias("first_b"))
    per_batch = gb.groupBy("batch").agg(F.count(F.lit(1)).alias("n_distinct"))
    novel = firsts.groupBy("first_b").agg(F.count(F.lit(1)).alias("n_new"))
    zero = F.lit(0).cast("long")
    return (
        per_batch.join(novel, per_batch.batch == novel.first_b, "left")
        .select(
            "batch",
            "n_distinct",
            F.coalesce(F.col("n_new"), zero).alias("n_new"),
            (
                F.coalesce(F.col("n_new"), zero).cast("double")
                / F.col("n_distinct").cast("double")
            ).alias("novelty_rate"),
        )
        .orderBy("batch")
    )


@register(
    "source_overlap_matrix",
    oracle="""
    WITH hs AS (SELECT DISTINCT MD5(text) AS h, source FROM documents),
    per_source AS (SELECT source, COUNT(*) AS n FROM hs GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
      FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT pa.source AS source_a, pb.source AS source_b,
           COALESCE(s.n_shared, CAST(0 AS BIGINT)) AS n_shared,
           pa.n AS n_a, pb.n AS n_b,
           CAST(COALESCE(s.n_shared, 0) AS DOUBLE)
             / CAST(pa.n + pb.n - COALESCE(s.n_shared, 0) AS DOUBLE) AS jaccard
    FROM per_source pa
    JOIN per_source pb ON pa.source < pb.source
    LEFT JOIN shared s
      ON s.source_a = pa.source AND s.source_b = pb.source
    ORDER BY source_a, source_b
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise content overlap between ingest sources: for EVERY source
    pair, the count of verbatim documents (by md5) they share and the
    Jaccard similarity of their distinct-hash sets — zero-overlap pairs
    included, so the result is the full upper-triangle governance matrix
    behind "crawl B is 80% a re-crawl of A — drop it", the cross-SOURCE
    complement of `source_dup_rate`'s within-source view.

    Plan: distinct (hash, source) — one shuffle, map-side partial dedup —
    then a self-equi-join ON THE HASH whose per-key fan-out is bounded by
    the source catalog size (a hash carries at most |sources| rows, and
    the a.source < b.source residual halves the pairs), a census
    aggregate over at most |sources|² rows, and finally a catalog-sized
    theta join (|sources|² pairs — the source catalog is organizationally
    bounded, dozens not millions, so the nested-loop pair grid is a
    constant) left-joined against the shared census. The corpus-sized
    work never leaves hash-keyed equi-joins; only catalog-sized relations
    reach the theta join. No driver-side materialization anywhere."""
    d = load_table(spark, sf_dir, "documents")
    hs = d.select(
        F.md5(F.col("text").cast("binary")).alias("h"), "source"
    ).distinct()
    per_source = hs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = hs.alias("a"), hs.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    pa = per_source.select(
        F.col("source").alias("source_a"), F.col("n").alias("n_a")
    )
    pb = per_source.select(
        F.col("source").alias("source_b"), F.col("n").alias("n_b")
    )
    pairs = pa.join(pb, F.col("source_a") < F.col("source_b"))
    zero = F.lit(0).cast("long")
    n_shared = F.coalesce(F.col("n_shared"), zero)
    return (
        pairs.join(shared, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            n_shared.alias("n_shared"),
            "n_a",
            "n_b",
            (
                n_shared.cast("double")
                / (F.col("n_a") + F.col("n_b") - n_shared).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


# Fixed packing context length for the histogram's padded-sequence
# column (matches pack_sequences' 512-token manifest).
_SEQ_LEN = 512


@register(
    "seq_len_histogram",
    oracle=f"""
    WITH t AS (
      SELECT CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_toks
      FROM documents),
    b AS (
      SELECT (LENGTH(PRINTF('%b', n_toks)) - 1) AS bucket,
             n_toks
      FROM t),
    census AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
             CAST(SUM((n_toks + {_SEQ_LEN - 1}) // {_SEQ_LEN}) AS BIGINT)
               AS seqs_padded_alone
      FROM b GROUP BY bucket)
    SELECT bucket,
           CAST(1 << bucket AS BIGINT) AS lo,
           CAST((1 << (bucket + 1)) - 1 AS BIGINT) AS hi,
           n_docs, total_tokens, seqs_padded_alone,
           CAST(SUM(n_docs) OVER (ORDER BY bucket
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_docs
    FROM census
    ORDER BY bucket
    """,
)
def seq_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-2 histogram of per-document whitespace token counts plus
    the padding cost of NOT packing: `seqs_padded_alone` is how many
    512-token training sequences the bucket consumes if every document is
    padded alone, vs the `total_tokens`/512 floor a packer achieves —
    the measurement behind choosing `pack_sequences` and a context
    length. Buckets are floor(log2 n) via the binary-digit-count trick
    (integer, libm-free, identical in both engines — same as
    `tfidf_topk_terms`' IDF).

    Plan: the bucket id and ceil-div are map-side integer projections;
    the census is one partial+final hash aggregate over ~20 groups (the
    shuffle moves ~20 rows per task regardless of SF); the cumulative
    count is a window over that 20-row census. No corpus-sized sort or
    join anywhere."""
    d = load_table(spark, sf_dir, "documents")
    n_toks = F.size(F.split(F.col("text"), " ")).cast("long")
    bucket = (F.length(F.conv(n_toks.cast("string"), 10, 2)) - 1).alias("bucket")
    census = (
        d.select(bucket, n_toks.alias("n_toks"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            # `div` = exact integer ceil-division (never a double round-trip)
            F.sum(
                F.expr(f"(n_toks + {_SEQ_LEN - 1}) div {_SEQ_LEN}")
            ).alias("seqs_padded_alone"),
        )
    )
    from pyspark.sql.window import Window

    cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return census.select(
        "bucket",
        F.expr("shiftleft(cast(1 as bigint), cast(bucket as int))").alias("lo"),
        F.expr(
            "shiftleft(cast(1 as bigint), cast(bucket + 1 as int)) - 1"
        ).alias("hi"),
        "n_docs",
        "total_tokens",
        "seqs_padded_alone",
        F.sum("n_docs").over(cum).alias("cum_docs"),
    ).orderBy("bucket")


# Minimum corpus occurrences for a bigram to be collocation-eligible —
# the standard small-count guard (lift explodes on hapax pairs).
_COLLOC_MIN_COUNT = 5


@register(
    "collocation_lift_topk",
    oracle=f"""
    WITH t AS (
      SELECT STRING_SPLIT({{norm}}, ' ') AS toks FROM documents),
    uni AS (
      SELECT u.tok AS token, CAST(COUNT(*) AS BIGINT) AS c
      FROM t, UNNEST(toks) AS u(tok)
      WHERE u.tok <> '' GROUP BY u.tok),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM uni),
    bi AS (
      SELECT b.bigram, CAST(COUNT(*) AS BIGINT) AS c_xy
      FROM t, UNNEST(
        CASE WHEN LEN(toks) >= 2 THEN
          LIST_TRANSFORM(RANGE(1, LEN(toks)),
                         i -> toks[i] || ' ' || toks[i + 1])
        ELSE [] END) AS b(bigram)
      GROUP BY b.bigram
      HAVING COUNT(*) >= {_COLLOC_MIN_COUNT}),
    scored AS (
      SELECT bi.bigram, bi.c_xy, ua.c AS c_x, ub.c AS c_y,
             CAST(bi.c_xy AS DOUBLE) * CAST(n.n_tokens AS DOUBLE)
               / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) AS lift
      FROM bi
      JOIN uni ua ON ua.token = STRING_SPLIT(bi.bigram, ' ')[1]
      JOIN uni ub ON ub.token = STRING_SPLIT(bi.bigram, ' ')[2]
      CROSS JOIN n)
    SELECT bigram, c_xy, c_x, c_y, lift
    FROM scored ORDER BY lift DESC, bigram LIMIT 50
    """.format(norm=_NORM_DUCK),
)
def collocation_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 word-pair collocations by lift = P(xy)/(P(x)·P(y)) — the
    PMI-family statistic behind multi-word-expression mining and
    tokenizer-merge candidates, spelled as a pure count ratio so no libm
    log ever runs (exact integer counts; ONE double expression per
    surviving bigram, identical shape in both engines).

    Plan (r7 rework — the 8.38×/10× SCALING fix): ONE corpus pass. The
    unigram and bigram occurrences explode from the same tokenized row
    as tagged terms (tag 0 = token, tag 1 = bigram), so the corpus is
    scanned + regex-normalized + split exactly once and ONE (tag, term)
    exchange with map-side partials builds both censuses together. The
    r6 shape re-derived the unigram census from the corpus for each of
    its three consumers (token total, left join, right join) — four
    corpus explodes in all, which is exactly what the sf1-equivalent
    measurement billed. The combined census is filtered to unigrams plus
    count>=5 bigrams BEFORE a spill-safe persist, so the cached relation
    is vocabulary-sized, both unigram-count joins read it (AQE
    broadcasts the small sides), the 1-row token total is a scalar
    broadcast, and the top-50 is TakeOrderedAndProject with an
    alphabetical tiebreak — never a global sort. At 100 TB the single
    tagged census shuffle dominates and is linear in corpus volume;
    everything after it is vocabulary-sized."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(F.split(F.expr(_NORM_SPARK), " ").alias("toks"))
    tagged = t.select(
        F.explode(
            F.expr(
                "concat("
                "transform(filter(toks, x -> x != ''), "
                "x -> named_struct('tag', 0, 'term', x)), "
                "case when size(toks) >= 2 then "
                "transform(sequence(1, size(toks) - 1), "
                "i -> named_struct('tag', 1, 'term', "
                "concat(element_at(toks, i), ' ', element_at(toks, i + 1)))) "
                "else array() end)"
            )
        ).alias("occ")
    ).select(F.col("occ.tag").alias("tag"), F.col("occ.term").alias("term"))
    census = managed_persist(
        tagged.groupBy("tag", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter((F.col("tag") == 0) | (F.col("c") >= _COLLOC_MIN_COUNT))
    )
    uni = census.filter(F.col("tag") == 0).select(
        F.col("term").alias("token"), "c"
    )
    n = uni.agg(F.sum("c").alias("n_tokens"))
    bi = census.filter(F.col("tag") == 1).select(
        F.col("term").alias("bigram"), F.col("c").alias("c_xy")
    )
    ua = uni.select(F.col("token").alias("tok_a"), F.col("c").alias("c_x"))
    ub = uni.select(F.col("token").alias("tok_b"), F.col("c").alias("c_y"))
    scored = (
        bi.withColumn("tok_a", F.element_at(F.split("bigram", " "), 1))
        .withColumn("tok_b", F.element_at(F.split("bigram", " "), 2))
        .join(ua, "tok_a")
        .join(ub, "tok_b")
        .crossJoin(F.broadcast(n))
        .select(
            "bigram",
            "c_xy",
            "c_x",
            "c_y",
            (
                F.col("c_xy").cast("double") * F.col("n_tokens").cast("double")
                / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), "bigram").limit(50)


# --- DSIR-style importance weighting ----------------------------------------

# Hashed-unigram bucket count for the importance model (DSIR, Xie et al.
# 2023, uses ~10k hashed n-gram buckets; 4096 = 3 md5 nibbles keeps the
# census broadcastable and the hash portable across both engines).
DSIR_B = 4096
# The target domain the importance model scores against. The fixture has
# no quality labels, so the reference-language slice stands in for
# "looks like the reference corpus" (production points this at the real
# target domain, e.g. Wikipedia-crawl docs).
_DSIR_TARGET_DUCK = "lang = 'en'"


def _dsir_hex12_duck(col: str) -> str:
    """DuckDB: first 3 hex chars of MD5(col) as an int in [0, 4095]
    (nibble arithmetic — same portable spelling as `_sql_hex16`)."""
    terms = [
        f"(STRPOS('{_HEX}', SUBSTR(MD5({col}), {1 + i}, 1)) - 1) * {16 ** (2 - i)}"
        for i in range(3)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, u.tok AS tok
      FROM (SELECT doc_id, lang, STRING_SPLIT({_NORM_DUCK}, ' ') AS t
            FROM documents) s, UNNEST(t) AS u(tok)
      WHERE u.tok <> ''),
    db AS (
      SELECT doc_id, lang, {_dsir_hex12_duck('tok')} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM toks GROUP BY 1, 2, 3),
    census AS (
      SELECT bucket,
             CAST(SUM(k) AS BIGINT) AS c_raw,
             CAST(SUM(CASE WHEN {_DSIR_TARGET_DUCK} THEN k ELSE 0 END)
                  AS BIGINT) AS c_tgt
      FROM db GROUP BY bucket),
    tot AS (
      SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
             CAST(SUM(c_tgt) AS BIGINT) AS n_tgt
      FROM census),
    leans AS (
      SELECT bucket,
             CASE WHEN CAST(c_tgt + 1 AS HUGEINT) * t.n_raw
                     > CAST(c_raw + 1 AS HUGEINT) * t.n_tgt
                    THEN 1
                  WHEN CAST(c_tgt + 1 AS HUGEINT) * t.n_raw
                     < CAST(c_raw + 1 AS HUGEINT) * t.n_tgt
                    THEN -1
                  ELSE 0 END AS lean
      FROM census CROSS JOIN tot t)
    SELECT db.doc_id, db.lang,
           CAST(SUM(db.k) AS BIGINT) AS n_tokens,
           CAST(SUM(db.k * l.lean) AS BIGINT) AS vote_score,
           CAST(SUM(db.k * l.lean) AS DOUBLE) / CAST(SUM(db.k) AS DOUBLE)
             AS mean_vote,
           SUM(db.k * l.lean) > 0 AS keep
    FROM db JOIN leans l USING (bucket)
    GROUP BY 1, 2
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023 —
    the hashed-n-gram importance model behind domain-targeted pretraining
    curation), in its sign-quantized engine-exact form: each hashed
    unigram bucket LEANS target (+1), raw (-1), or neither (0) by the
    exact integer cross-multiplication
    (c_tgt+1)·N_raw vs (c_raw+1)·N_tgt — the sign of the DSIR log-ratio
    log p_target(b) - log p_raw(b) with +1 smoothing on the bucket
    counts (a zero-count bucket leans away, never divides by zero) and
    UNSMOOTHED totals, so the decision boundary is the unbiased
    frequency ratio (Laplace's +B on two different-sized totals shifts
    the boundary by O(B/N) — at fixture scale that bias is larger than
    the signal and votes degenerate to one side). Decided with NO
    logarithm, NO float, and NO overflow (the cross products ride
    128-bit/decimal arithmetic; exact at 100 TB token counts). A document's vote_score sums k·lean over its tokens:
    positive means its vocabulary leans toward the target domain's
    distribution. Production DSIR samples by the real-valued log-ratio;
    the sign projection keeps the decision boundary identical for every
    bucket while staying bit-reproducible across engines and
    partitionings (a float log-sum would be neither). The fixture's
    target slice is the reference-language documents (lang='en' — the
    synthetic corpus has no quality labels); production points the
    target filter at the real domain sample, e.g. Wikipedia.

    Plan: one corpus explode collapses immediately to the unique
    (doc, bucket) count table (persisted — it feeds the census AND the
    per-doc scorer, the `doc_rarity_score` lesson); the bucket census is
    4096 rows with both the raw and target counts folded in ONE pass
    (no second corpus scan for the target slice — a CASE inside the
    aggregate); the per-bucket lean is decided on the census joined with
    the 1-row totals broadcast, and the scoring join broadcasts the
    4096-row lean table. At 100 TB the explode + pair shuffle dominates
    and is linear; everything downstream of the pair table is bucket- or
    doc-sized."""
    d = load_table(spark, sf_dir, "documents")
    pairs = (
        d.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.expr(_NORM_SPARK), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            "lang",
            F.conv(F.substring(F.md5("tok"), 1, 3), 16, 10)
            .cast("int")
            .alias("bucket"),
        )
    )
    db = managed_persist(
        pairs.groupBy("doc_id", "lang", "bucket").agg(F.count(F.lit(1)).alias("k"))
    )
    is_tgt = F.col("lang") == "en"
    census = db.groupBy("bucket").agg(
        F.sum("k").alias("c_raw"),
        F.sum(F.when(is_tgt, F.col("k")).otherwise(F.lit(0))).alias("c_tgt"),
    )
    tot = census.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    # Exact 128-bit-wide cross products: bigint*bigint would overflow at
    # production token counts, DECIMAL(38,0) cannot (10^13-scale counts
    # square to 10^26 << 10^38).
    dec = "decimal(38,0)"
    lhs = (F.col("c_tgt") + 1).cast(dec) * F.col("n_raw").cast(dec)
    rhs = (F.col("c_raw") + 1).cast(dec) * F.col("n_tgt").cast(dec)
    leans = (
        census.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.when(lhs > rhs, F.lit(1))
            .when(lhs < rhs, F.lit(-1))
            .otherwise(F.lit(0))
            .alias("lean"),
        )
    )
    score = F.sum(F.col("k") * F.col("lean"))
    return (
        db.join(F.broadcast(leans), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            score.cast("long").alias("vote_score"),
            (score.cast("double") / F.sum("k").cast("double")).alias(
                "mean_vote"
            ),
            (score > 0).alias("keep"),
        )
    )


# --- composed curation flagship (r9) -----------------------------------------

from ..registry import ORACLES as _ORACLES  # noqa: E402  (read after the components register above)


@register(
    "curation_funnel",
    # Zero-drift composition: the two stage oracles are spliced in as the
    # EXACT registered strings (DuckDB allows a WITH inside a derived
    # table), so this funnel can never silently diverge from the
    # independently verified stage semantics.
    oracle=f"""
    WITH q AS (
      SELECT doc_id, keep AS q_keep
      FROM ({_ORACLES["quality_classifier_linear"]})),
    d AS (
      SELECT doc_id, lang, n_tokens, keep AS d_keep
      FROM ({_ORACLES["dsir_importance_weights"]}))
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN q.q_keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality,
           CAST(SUM(CASE WHEN q.q_keep AND d.d_keep THEN 1 ELSE 0 END)
             AS BIGINT) AS n_curated,
           CAST(SUM(CASE WHEN q.q_keep AND d.d_keep THEN d.n_tokens ELSE 0 END)
             AS BIGINT) AS tokens_curated
    FROM d JOIN q USING (doc_id)
    GROUP BY 1
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second composed flagship (r8 VERDICT item 8): the model-scored
    curation funnel — fixed-weight linear quality gate
    (:func:`quality_classifier_linear`) and DSIR importance vote
    (:func:`dsir_importance_weights`) fused into a per-language
    data-card: documents entering, surviving the quality gate, surviving
    both (curated), and the curated token budget. This is the report a
    pretraining data team reads before committing a mixture — and unlike
    rule-only gates (``pipeline_end_to_end``'s Gopher → dedup →
    decontaminate chain), both stages here are MODEL-shaped scores, so
    the funnel demonstrates classifier-driven curation end to end.

    Composed from the registered operators themselves (the same pattern
    as ``embed_recall_at_k``): what this audits is exactly what the
    engine serves. Per-doc rows with no post-normalization tokens carry
    no DSIR evidence and drop from the funnel on both sides (inner
    join), mirroring the DSIR stage's own domain.

    Scale: the DSIR stage's explode + pair shuffle dominates and is
    linear (its persisted (doc, lang, bucket) table is released by the
    harness contract); the quality stage is one map-side projection; the
    final join is doc-sized onto doc-sized, followed by a |langs|-row
    census. All integer counts — the only floats anywhere are inside the
    stage decisions, which are engine-exact by the stages' own designs."""
    q = quality_classifier_linear(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("q_keep")
    )
    d = dsir_importance_weights(spark, sf_dir).select(
        "doc_id", "lang", "n_tokens", F.col("keep").alias("d_keep")
    )
    both = F.col("q_keep") & F.col("d_keep")
    return (
        d.join(q, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("q_keep"), F.lit(1)).otherwise(F.lit(0))).alias(
                "n_quality"
            ),
            F.sum(F.when(both, F.lit(1)).otherwise(F.lit(0))).alias("n_curated"),
            F.sum(F.when(both, F.col("n_tokens")).otherwise(F.lit(0))).alias(
                "tokens_curated"
            ),
        )
    )
