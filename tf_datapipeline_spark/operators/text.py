"""Text analysis over `documents` (SURVEY.md §2B "text analysis" + the
driver contract's training-data ops): token stats, quality scoring,
language-ID heuristic, BPE-ish token counting, fingerprinting, TF-IDF,
string-similarity pairs.

All pure built-in column expressions — no Python UDFs — so the hot path
stays in whole-stage codegen and the DuckDB oracle can check every op.
Per-row ratios are single IEEE divisions (deterministic); aggregate sums
are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_datapipeline_spark.catalog import load_table
from tf_datapipeline_spark.registry import query

# Whitespace-token split shared by several ops (lazy: building a Column
# requires an active SparkSession).
def _tokens_spark():
    return F.split(F.trim(F.col("text")), r"\s+")
_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

_STOPWORDS = ("the", "a", "of", "and", "to", "in")
_SW_LIST = ", ".join(f"'{w}'" for w in _STOPWORDS)


# --------------------------------------------------------------------------
# q50 — per-document token statistics.
# --------------------------------------------------------------------------
@query(
    "q50_token_stats",
    oracle=f"""
    SELECT doc_id,
           n_chars,
           CAST(length({_TOKENS_SQL}) AS INT) AS n_tokens,
           CAST(n_chars AS DOUBLE) / length({_TOKENS_SQL}) AS chars_per_token
    FROM documents
    """,
)
def q50_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens_spark())
    return docs.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        (F.col("n_chars").cast("double") / n_tokens).alias("chars_per_token"),
    )


# --------------------------------------------------------------------------
# q51 — quality scoring: alpha/space/stopword ratios + a quality flag.
# Counting by length-difference after regexp_replace (global in Spark by
# default; DuckDB needs the 'g' flag).
# --------------------------------------------------------------------------
@query(
    "q51_quality_score",
    oracle=f"""
    SELECT doc_id,
           (CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS DOUBLE)
             / length(text)) AS alpha_ratio,
           (CAST(length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
             / length(text)) AS space_ratio,
           (CAST(length(list_filter({_TOKENS_SQL}, t -> t IN ({_SW_LIST}))) AS DOUBLE)
             / length({_TOKENS_SQL})) AS stopword_ratio,
           CASE WHEN n_chars >= 100
                 AND length(list_filter({_TOKENS_SQL}, t -> t IN ({_SW_LIST}))) > 0
                THEN 1 ELSE 0 END AS is_quality
    FROM documents
    """,
)
def q51_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text_len = F.length("text")
    alpha = text_len - F.length(F.regexp_replace("text", "[a-z]", ""))
    space = text_len - F.length(F.regexp_replace("text", r"\s", ""))
    n_stop = F.size(
        F.filter(_tokens_spark(), lambda t: t.isin(*_STOPWORDS))
    )
    n_tokens = F.size(_tokens_spark())
    return docs.select(
        "doc_id",
        (alpha.cast("double") / text_len).alias("alpha_ratio"),
        (space.cast("double") / text_len).alias("space_ratio"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        F.when((F.col("n_chars") >= 100) & (n_stop > 0), 1)
        .otherwise(0)
        .alias("is_quality"),
    )


# --------------------------------------------------------------------------
# q52 — language-ID heuristic: marker-word counts per language, argmax
# with lexicographic tie-break. (The engine op; on this synthetic corpus
# most docs score 'en'.)
# --------------------------------------------------------------------------
_LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de", "shi", "le", "zai", "he"),
}


def _sql_lang_score(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"length(list_filter({_TOKENS_SQL}, t -> t IN ({words})))"


@query(
    "q52_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS actual_lang,
             {_sql_lang_score('de')} AS s_de,
             {_sql_lang_score('en')} AS s_en,
             {_sql_lang_score('es')} AS s_es,
             {_sql_lang_score('fr')} AS s_fr,
             {_sql_lang_score('zh')} AS s_zh
      FROM documents
    )
    SELECT doc_id, actual_lang,
           CASE GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
                WHEN s_fr THEN 'fr' ELSE 'zh' END AS pred_lang,
           GREATEST(s_de, s_en, s_es, s_fr, s_zh) AS top_score
    FROM scored
    """,
)
def q52_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    def count_markers(words):
        return F.size(F.filter(_tokens_spark(), lambda t: t.isin(*words)))

    scores = {lang: count_markers(words) for lang, words in _LANG_MARKERS.items()}
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[scores[lang].alias(f"s_{lang}") for lang in sorted(_LANG_MARKERS)],
    )
    top = F.greatest(*[F.col(f"s_{lang}") for lang in sorted(_LANG_MARKERS)])
    pred = (
        F.when(F.col("s_de") == top, "de")
        .when(F.col("s_en") == top, "en")
        .when(F.col("s_es") == top, "es")
        .when(F.col("s_fr") == top, "fr")
        .otherwise("zh")
    )
    return scored.select(
        "doc_id", "actual_lang", pred.alias("pred_lang"), top.alias("top_score")
    )


# --------------------------------------------------------------------------
# q53 — BPE-ish token counting: words / numbers / punctuation as separate
# tokens (the "token budget" op of a training-data pipeline).
# --------------------------------------------------------------------------
_BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@query(
    "q53_token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '{_BPE_PATTERN}')) AS INT) AS n_bpe_tokens,
           CAST(length(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_number_tokens
    FROM documents
    """,
)
def q53_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_BPE_PATTERN)).alias("n_bpe_tokens"),
        F.regexp_count("text", F.lit("[0-9]+")).alias("n_number_tokens"),
    )


# --------------------------------------------------------------------------
# q54 — document fingerprint: md5 content hash + duplicate-cluster size
# (the fingerprint both exact-dedup variants build on).
# --------------------------------------------------------------------------
@query(
    "q54_fingerprint",
    oracle="""
    SELECT doc_id, md5(text) AS fingerprint,
           COUNT(*) OVER (PARTITION BY md5(text)) AS cluster_size
    FROM documents
    """,
)
def q54_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("fingerprint"),
        F.count(F.lit(1))
        .over(Window.partitionBy(F.md5("text")))
        .alias("cluster_size"),
    )


# --------------------------------------------------------------------------
# qt0 — composite per-document text profile: token stats (q50), quality
# ratios + flag (q51), language-ID heuristic (q52), BPE-ish token budget
# (q53) and content fingerprint + duplicate-cluster size (q54) in ONE
# scan — one wide oracle-checked row per document covering the five
# mandated text ops. Everything is built-in column expressions (single
# codegen stage); the only shuffle is the fingerprint-cluster window,
# partitioned by the content hash.
# --------------------------------------------------------------------------
@query(
    "qt0_text_profile",
    oracle=f"""
    SELECT doc_id,
           n_chars,
           CAST(length({_TOKENS_SQL}) AS INT) AS n_tokens,
           (CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS DOUBLE)
             / length(text)) AS alpha_ratio,
           (CAST(length(list_filter({_TOKENS_SQL}, t -> t IN ({_SW_LIST}))) AS DOUBLE)
             / length({_TOKENS_SQL})) AS stopword_ratio,
           CASE WHEN n_chars >= 100
                 AND length(list_filter({_TOKENS_SQL}, t -> t IN ({_SW_LIST}))) > 0
                THEN 1 ELSE 0 END AS is_quality,
           CASE GREATEST({_sql_lang_score('de')}, {_sql_lang_score('en')},
                         {_sql_lang_score('es')}, {_sql_lang_score('fr')},
                         {_sql_lang_score('zh')})
                WHEN {_sql_lang_score('de')} THEN 'de'
                WHEN {_sql_lang_score('en')} THEN 'en'
                WHEN {_sql_lang_score('es')} THEN 'es'
                WHEN {_sql_lang_score('fr')} THEN 'fr'
                ELSE 'zh' END AS pred_lang,
           CAST(length(regexp_extract_all(text, '{_BPE_PATTERN}')) AS INT) AS n_bpe_tokens,
           md5(text) AS fingerprint,
           COUNT(*) OVER (PARTITION BY md5(text)) AS cluster_size
    FROM documents
    """,
)
def qt0_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    text_len = F.length("text")
    alpha = text_len - F.length(F.regexp_replace("text", "[a-z]", ""))
    n_stop = F.size(F.filter(_tokens_spark(), lambda t: t.isin(*_STOPWORDS)))
    n_tokens = F.size(_tokens_spark())

    def count_markers(words):
        return F.size(F.filter(_tokens_spark(), lambda t: t.isin(*words)))

    scores = {lang: count_markers(words) for lang, words in _LANG_MARKERS.items()}
    top = F.greatest(*[scores[lang] for lang in sorted(_LANG_MARKERS)])
    pred = (
        F.when(scores["de"] == top, "de")
        .when(scores["en"] == top, "en")
        .when(scores["es"] == top, "es")
        .when(scores["fr"] == top, "fr")
        .otherwise("zh")
    )
    return docs.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        (alpha.cast("double") / text_len).alias("alpha_ratio"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        F.when((F.col("n_chars") >= 100) & (n_stop > 0), 1)
        .otherwise(0)
        .alias("is_quality"),
        pred.alias("pred_lang"),
        F.regexp_count("text", F.lit(_BPE_PATTERN)).alias("n_bpe_tokens"),
        F.md5("text").alias("fingerprint"),
        F.count(F.lit(1))
        .over(Window.partitionBy(F.md5("text")))
        .alias("cluster_size"),
    )


# --------------------------------------------------------------------------
# q55 — TF-IDF: explode tokens → tf per (doc, term), df per term over the
# corpus, rational idf N/df (no transcendental: ln differs across libm
# builds; the ranking is monotone-equivalent). Two shuffles: one on
# (doc_id, term), one broadcast-back of the tiny term-df dim.
# --------------------------------------------------------------------------
@query(
    "q55_tfidf",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    )
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    WHERE tf.tf >= 8
    """,
)
def q55_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens_spark()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.filter(F.col("tf") >= 8)
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * (F.col("n_docs").cast("double") / F.col("df"))).alias(
                "tfidf"
            ),
        )
    )


# --------------------------------------------------------------------------
# q56 — string-similarity pairs: levenshtein distance within same-(lang,
# source) blocks, bounded by a LENGTH-BAND blocking key: floor(len/32).
# Edit distance >= |len_a - len_b|, so any pair worth reporting sits in
# the same or an adjacent band — non-adjacent pairs (distance >= 32) are
# excluded BY DESIGN, which caps block size independent of corpus skew
# (a hot (en, common-crawl) block no longer goes O(block^2) at 100x).
# Realized as an equi-join on (lang, source, band): the b side probes its
# own and both neighbor bands, so each qualifying pair matches exactly
# once and the join stays a hash join.
# --------------------------------------------------------------------------
@query(
    "q56_levenshtein_pairs",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.text, b.text) AS edit_distance,
           1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
                 / GREATEST(length(a.text), length(b.text)) AS similarity
    FROM documents a
    JOIN documents b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
     AND abs(CAST(FLOOR(length(a.text) / 32.0) AS BIGINT)
             - CAST(FLOOR(length(b.text) / 32.0) AS BIGINT)) <= 1
    WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 = 0
    """,
)
def q56_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    band = F.floor(F.length("text") / 32)
    a = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang"),
        F.col("source").alias("source"),
        F.col("text").alias("text_a"),
        band.alias("band"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang"),
        F.col("source").alias("source"),
        F.col("text").alias("text_b"),
        F.explode(
            F.array(band - 1, band, band + 1)
        ).alias("band"),
    )
    lev = F.levenshtein("text_a", "text_b")
    return (
        a.join(b, ["lang", "source", "band"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            lev.alias("edit_distance"),
            (
                1.0
                - lev.cast("double")
                / F.greatest(F.length("text_a"), F.length("text_b"))
            ).alias("similarity"),
        )
    )


# --------------------------------------------------------------------------
# q57 — corpus preparation: the composed training-data filter chain a
# reference user actually runs — quality gate (length + stopword
# presence, q51's predicate) AND exact-dedup keeper (min doc_id per
# content hash, q60/q61's policy) — rolled up per (lang, source). One
# scan + one dedup shuffle + one semi join + one agg; every stage is the
# already-verified operator, composed.
# --------------------------------------------------------------------------
@query(
    "q57_corpus_prep",
    oracle=f"""
    WITH keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    quality AS (
      SELECT doc_id, lang, source, n_chars
      FROM documents
      WHERE n_chars >= 100
        AND length(list_filter({_TOKENS_SQL}, t -> t IN ({_SW_LIST}))) > 0
    )
    SELECT q.lang, q.source,
           COUNT(*) AS n_kept,
           CAST(SUM(q.n_chars) AS BIGINT) AS total_chars
    FROM quality q JOIN keepers k ON k.doc_id = q.doc_id
    GROUP BY 1, 2
    """,
)
def q57_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keepers = docs.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    n_stop = F.size(F.filter(_tokens_spark(), lambda t: t.isin(*_STOPWORDS)))
    quality = docs.filter((F.col("n_chars") >= 100) & (n_stop > 0)).select(
        "doc_id", "lang", "source", "n_chars"
    )
    kept = quality.join(keepers.select("doc_id"), "doc_id", "left_semi")
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# q58 — vocabulary builder: corpus-wide token frequencies, top 100 by
# (count desc, token) — the vocab/token-budget job of a training
# pipeline. Explode shuffles one row per token; the count is map-side
# partial so the exchange carries (token, partial_count), and the top-k
# is a TakeOrdered, not a global sort.
# --------------------------------------------------------------------------
@query(
    "q58_vocabulary",
    oracle=f"""
    SELECT token, COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents
    )
    WHERE token <> ''
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 100
    """,
)
def q58_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens_spark()).alias("token")).filter(
        F.col("token") != ""
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(100)
    )
