"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface (language ID, quality scoring, token
counting, fingerprinting) the brief adds on top of the reference's
transport-only capabilities.

All hot-path expressions are built-in higher-order functions (split /
filter / transform / aggregate) — JVM-side, no Python per row; at 100 TB
these are embarrassingly parallel projections with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..registry import register

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Real lists (not fixture-derived); scoring is deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr": ("le", "la", "les", "et", "est", "une", "pour", "dans", "que", "pas"),
    "es": ("el", "la", "los", "y", "es", "una", "para", "en", "que", "no"),
}
# Deterministic preference order for score ties (alphabetical).
LANG_ORDER = ("de", "en", "es", "fr")

# A small English stopword list for quality scoring.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

# THE canonical text normalization chain (lowercase, strip non-alnum,
# collapse whitespace) — single source of truth for text_normalize and
# every ngram consumer in operators/pipeline.py; the Spark and DuckDB
# strings must stay semantically identical.
NORM_SPARK_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' '))"
)
NORM_DUCK_SQL = (
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
)


def _sql_in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.lower(F.col(col)), " ")


@register(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           LENGTH(text) AS n_chars_computed,
           CAST(LEN(STRING_SPLIT(LOWER(text), ' ')) AS INT) AS n_tokens,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / LEN(STRING_SPLIT(LOWER(text), ' ')) AS avg_token_len,
           CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                                t -> t IN ({_sql_in_list(STOPWORDS)}))) AS DOUBLE)
             / LEN(STRING_SPLIT(LOWER(text), ' ')) AS stopword_ratio,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(LOWER(text), ' '))) AS DOUBLE)
             / LEN(STRING_SPLIT(LOWER(text), ' ')) AS distinct_ratio
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_computed"),
        n_tokens.cast("int").alias("n_tokens"),
        (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n_tokens).alias(
            "avg_token_len"
        ),
        (stop_hits.cast("double") / n_tokens).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tokens).alias("distinct_ratio"),
    )


def _lang_score_sql(lang: str) -> str:
    return (
        f"LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), "
        f"t -> t IN ({_sql_in_list(LANG_MARKERS[lang])})))"
    )


@register(
    "lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             {_lang_score_sql('de')} AS s_de,
             {_lang_score_sql('en')} AS s_en,
             {_lang_score_sql('es')} AS s_es,
             {_lang_score_sql('fr')} AS s_fr
      FROM documents)
    SELECT doc_id,
           CASE
             WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
             WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
             WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
             WHEN s_es >= s_fr THEN 'es'
             ELSE 'fr'
           END AS lang_pred,
           CAST(GREATEST(s_de, s_en, s_es, s_fr) AS INT) AS marker_hits
    FROM scored
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID (n-gram-heuristic family). Deterministic
    argmax with alphabetical tie-break; 'und' when no marker matches."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()

    # NB: HOF lambdas must be unary — a second (default) parameter makes
    # PySpark pass the array index as the extra argument.
    def marker_filter(markers: tuple[str, ...]):
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_filter(LANG_MARKERS[lang])))
        for lang in LANG_ORDER
    }
    scored = d.select(
        "doc_id", *[scores[lang].alias(f"s_{lang}") for lang in LANG_ORDER]
    )
    s = {lang: F.col(f"s_{lang}") for lang in LANG_ORDER}
    best = F.greatest(*s.values())
    pred = (
        F.when(best == 0, "und")
        .when((s["de"] >= s["en"]) & (s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    return scored.select("doc_id", pred.alias("lang_pred"), best.cast("int").alias("marker_hits"))


@register(
    "token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS ws_tokens,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS bpe_ish_tokens
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count (letters runs,
    digit runs, single punctuation — the pre-tokenization split most BPE
    vocabularies assume)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("int").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
        .cast("int")
        .alias("bpe_ish_tokens"),
    )


@register(
    "quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             STRING_SPLIT(LOWER(text), ' ') AS toks,
             LENGTH(text) AS nch
      FROM documents)
    SELECT doc_id,
           LEAST(CAST(LEN(toks) AS DOUBLE) / 100.0, 1.0) * 0.4
           + (CAST(LEN(LIST_FILTER(toks, x -> x IN ({_sql_in_list(STOPWORDS)}))) AS DOUBLE)
              / LEN(toks)) * 0.3
           + (CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks)) * 0.3 AS quality,
           CAST(LEN(toks) >= 10 AND nch >= 50 AS BOOLEAN) AS passes_length_gate
    FROM t
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality: length saturation, stopword density,
    lexical diversity — the usual pre-training corpus filters."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / n
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    length_sat = F.least(n.cast("double") / 100.0, F.lit(1.0))
    return d.select(
        "doc_id",
        (length_sat * 0.4 + stop_ratio * 0.3 + diversity * 0.3).alias("quality"),
        ((n >= 10) & (F.length("text") >= 50)).alias("passes_length_gate"),
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           MD5(text) AS content_md5,
           CAST(LIST_REDUCE(
             LIST_PREPEND(CAST(0 AS BIGINT),
               LIST_TRANSFORM(STRING_SPLIT(text, ' '), t -> CAST(LENGTH(t) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS rolling_hash
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 (exact identity) + a polynomial rolling
    hash over token lengths (shift-resistant family)."""
    d = load_table(spark, sf_dir, "documents")
    rolling = F.aggregate(
        F.transform(F.split(F.col("text"), " "), lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % 1000000007,
    )
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("content_md5"),
        rolling.cast("long").alias("rolling_hash"),
    )


@register(
    "text_normalize",
    oracle=f"""
    SELECT doc_id,
           {NORM_DUCK_SQL} AS norm_text,
           LENGTH({NORM_DUCK_SQL}) AS norm_len
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the first stage of every training-data
    pipeline): lowercase, strip non-alphanumerics, collapse whitespace.
    Pure codegen'd regexp_replace chain — map-side at any scale."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.expr(NORM_SPARK_SQL)
    return d.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_len")
    )


EMBED_DIM = 16


@register(
    "text_embed_hash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS t FROM documents),
    dims AS (
      SELECT doc_id,
             LIST_TRANSFORM(RANGE(0, {EMBED_DIM}), d ->
               LIST_REDUCE(
                 LIST_PREPEND(CAST(0 AS BIGINT),
                   LIST_TRANSFORM(t, tok ->
                     CASE WHEN CAST(CONCAT('0x', SUBSTR(MD5(tok), 1, 15)) AS BIGINT)
                               % {EMBED_DIM} = d
                          THEN ((CAST(CONCAT('0x', SUBSTR(MD5(tok), 1, 15)) AS BIGINT)
                                 >> 4) % 2) * 2 - 1
                          ELSE CAST(0 AS BIGINT) END)),
                 (a, x) -> a + x)) AS emb
      FROM toks)
    SELECT doc_id,
           ARRAY_TO_STRING(LIST_TRANSFORM(emb, x -> CAST(x AS VARCHAR)), ',') AS emb_csv,
           CAST(LEN(LIST_FILTER(emb, x -> x <> 0)) AS INT) AS nnz
    FROM dims
    """,
)
def text_embed_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing document embedder (the hashing-trick bag-of-words:
    each token adds ±1 to dimension hash(token) % D, sign from the next
    hash bit) — the deterministic, vocabulary-free 'embed' stage that
    completes the text → embedding → ANN chain next to the dedup
    signatures. One Arrow pass per batch (same pattern and rationale as
    dedup.hashed_shingles_udf: per-token md5 in interpreted HOFs is the
    measured slow path), map-side, no shuffle; integer-valued output so
    the rendering is exact on both engines."""
    dim = EMBED_DIM

    @F.pandas_udf("string")
    def embed_csv(texts):
        import hashlib

        def one(text: str) -> str:
            acc = [0] * dim
            for tok in text.lower().split(" "):
                h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
                acc[h % dim] += ((h >> 4) % 2) * 2 - 1
            return ",".join(str(x) for x in acc)

        return texts.map(one)

    d = load_table(spark, sf_dir, "documents")
    out = d.select("doc_id", embed_csv("text").alias("emb_csv"))
    nnz = F.size(
        F.filter(
            F.split(F.col("emb_csv"), ","), lambda x: x != "0"
        )
    ).cast("int")
    return out.select("doc_id", "emb_csv", nnz.alias("nnz"))


@register(
    "lang_confusion_matrix",
    oracle=f"""
    WITH scored AS (
      SELECT lang,
             {_lang_score_sql('de')} AS s_de,
             {_lang_score_sql('en')} AS s_en,
             {_lang_score_sql('es')} AS s_es,
             {_lang_score_sql('fr')} AS s_fr
      FROM documents),
    pred AS (
      SELECT lang,
             CASE
               WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
               WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
               WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
               WHEN s_es >= s_fr THEN 'es'
               ELSE 'fr'
             END AS lang_pred
      FROM scored),
    census AS (
      SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM pred GROUP BY lang, lang_pred)
    SELECT lang, lang_pred, n_docs,
           CAST(n_docs AS DOUBLE)
             / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE)
             AS share_of_lang
    FROM census
    ORDER BY lang, lang_pred
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement census between the ingest metadata's ``lang`` column and
    the `lang_id` heuristic's prediction — the confusion matrix a data
    team reads to decide whether to trust crawl-supplied language tags or
    re-tag the corpus (off-diagonal mass = mislabeled training data
    leaking into per-language sampling weights).

    Plan: the marker scoring is the same shuffle-free map-side HOF pass
    as `lang_id`; the census is one partial+final hash aggregate over at
    most |langs|·(|langs|+1) groups, so the shuffle moves a handful of
    rows per task regardless of corpus size; the per-lang share is a
    window over that census (catalog-sized, not corpus-sized).
    Determinism: integer marker counts, alphabetical argmax tie-break,
    and a single double division per output row."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()

    def marker_filter(markers: tuple[str, ...]):
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_filter(LANG_MARKERS[lang])))
        for lang in LANG_ORDER
    }
    scored = d.select(
        "lang", *[scores[lang].alias(f"s_{lang}") for lang in LANG_ORDER]
    )
    s = {lang: F.col(f"s_{lang}") for lang in LANG_ORDER}
    best = F.greatest(*s.values())
    pred = (
        F.when(best == 0, "und")
        .when((s["de"] >= s["en"]) & (s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    census = (
        scored.select("lang", pred.alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    from pyspark.sql.window import Window

    per_lang = Window.partitionBy("lang")
    return census.select(
        "lang",
        "lang_pred",
        "n_docs",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(per_lang).cast("double")
        ).alias("share_of_lang"),
    ).orderBy("lang", "lang_pred")


# BM25 retrieval scoring: the fixed query term set (one rare, informative
# term plus two common ones, so the fixture exercises both the idf signal
# and the length normalization) and the standard Okapi constants.
BM25_TERMS = ("dup", "merge", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 50

_BM25_DOC_DUCK = ", ".join(
    "LEN(LIST_FILTER(STRING_SPLIT({norm}, ' '), x -> x = '" + t + "')) AS tf_" + t
    for t in BM25_TERMS
).replace("{norm}", NORM_DUCK_SQL)
_BM25_G_DUCK = ", ".join(
    f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
    for t in BM25_TERMS
)
# floor(log2(n)) as binary-digit-count - 1 (PRINTF('%b') mirrors Spark's
# conv(n,10,2)) — the repo's exact integer idf, no libm.
_BM25_SCORE_DUCK = " + ".join(
    f"(CAST((LENGTH(PRINTF('%b', n_docs)) - 1) - "
    f"(LENGTH(PRINTF('%b', GREATEST(df_{t}, 1))) - 1) AS DOUBLE)"
    f" * ((CAST(tf_{t} AS DOUBLE) * {BM25_K1 + 1.0}) / "
    f"(CAST(tf_{t} AS DOUBLE) + {BM25_K1} * "
    f"({1.0 - BM25_B} + {BM25_B} * (CAST(dl AS DOUBLE) / avgdl)))))"
    for t in BM25_TERMS
)


@register(
    "bm25_topk",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             LEN(LIST_FILTER(STRING_SPLIT({NORM_DUCK_SQL}, ' '),
                             x -> x <> '')) AS dl,
             {_BM25_DOC_DUCK}
      FROM documents),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
             {_BM25_G_DUCK}
      FROM d)
    SELECT doc_id, CAST(dl AS BIGINT) AS dl,
           CAST(tf_dup AS BIGINT) AS tf_dup,
           CAST(tf_merge AS BIGINT) AS tf_merge,
           CAST(tf_window AS BIGINT) AS tf_window,
           {_BM25_SCORE_DUCK} AS score
    FROM d, g
    ORDER BY score DESC, doc_id
    LIMIT {BM25_TOPK}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k retrieval over the corpus for a fixed query
    (k1=1.2, b=0.75, terms `dup merge window`) — the relevance-ranking
    primitive behind corpus search / retrieval-augmented sampling.

    Spark-first plan with ZERO corpus shuffles: per-doc term frequencies
    and document length are higher-order-function projections (size of
    filter(split)) — no explode, no aggregation exchange; the corpus
    constants (N, df per term, avgdl) reduce to ONE row via a map-side
    partial aggregate and broadcast back as a 1-row cross join; scoring
    is a map-side expression; the top-k is TakeOrderedAndProject with a
    doc_id tiebreak — never a global sort. At 100 TB the whole operator
    is one scan + one scalar broadcast.

    Cross-engine determinism: idf is the repo's exact integer digit-count
    log2 (floor(log2 N) - floor(log2 df), Spark `conv`/DuckDB
    `PRINTF('%b')`), tf/dl are exact integers, and the remaining
    arithmetic is a single identically-shaped IEEE expression tree in
    both engines (+ - * / only, correctly rounded, no libm).

    Fixture-honesty note (the DSIR lesson): the synthetic corpus has a
    ~31-token vocabulary where the two common query terms appear in ~90%
    of docs, so their integer idf quantizes to 0 and only the rare term
    (`dup`, ~2.6% of docs) scores — the top of the ranking carries real
    signal (rare-term tf + length normalization), the zero-score tail is
    doc_id-tiebroken. On a natural corpus the digit-count idf spreads
    over ~15 levels and all terms contribute."""
    d = load_table(spark, sf_dir, "documents")
    # ONE normalize+split+fold per row: higher-order functions are
    # CodegenFallback, so common-subexpression elimination does NOT dedupe
    # a split() repeated across four projections — four independent
    # size(filter(split(...))) columns re-ran the regex chain 4x per row
    # (measured 17.0 s -> 2.3 s at the sf1-equivalent corpus for this one
    # change). The single aggregate() computes dl and all three term
    # frequencies in one pass over one token array.
    fold = ", ".join(
        f"'tf{i}', acc.tf{i} + if(x = '{t}', 1L, 0L)"
        for i, t in enumerate(BM25_TERMS)
    )
    zero = ", ".join(f"'tf{i}', 0L" for i in range(len(BM25_TERMS)))
    st = F.expr(
        f"aggregate(filter(split({NORM_SPARK_SQL}, ' '), x -> x != ''), "
        f"named_struct('dl', 0L, {zero}), "
        f"(acc, x) -> named_struct('dl', acc.dl + 1L, {fold}))"
    )
    per_doc = d.select("doc_id", st.alias("st")).select(
        "doc_id",
        F.col("st.dl").alias("dl"),
        *[
            F.col(f"st.tf{i}").alias(f"tf_{t}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    g = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).cast("long").alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )

    def log2i(c: F.Column) -> F.Column:
        return F.length(F.conv(c.cast("string"), 10, 2)) - 1

    def term_score(t: str) -> F.Column:
        idf = (log2i(F.col("n_docs")) - log2i(F.greatest(F.col(f"df_{t}"), F.lit(1)))).cast("double")
        tf = F.col(f"tf_{t}").cast("double")
        norm = F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (
            F.col("dl").cast("double") / F.col("avgdl")
        )
        return idf * ((tf * F.lit(BM25_K1 + 1.0)) / (tf + F.lit(BM25_K1) * norm))

    score = term_score(BM25_TERMS[0])
    for t in BM25_TERMS[1:]:
        score = score + term_score(t)
    return (
        per_doc.crossJoin(F.broadcast(g))
        .select(
            "doc_id", "dl",
            *[f"tf_{t}" for t in BM25_TERMS],
            score.alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
    )
