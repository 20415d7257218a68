"""Tier D — text-analysis queries (SURVEY.md SS2-D D5 + BASELINE.json:
language-ID, quality scoring, token counting, fingerprinting).
Engine logic in operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..operators import text as TX
from ..registry import register

_STOP_SQL = ", ".join(f"'{w}'" for w in TX.STOPWORDS)
# DuckDB regex strings need doubled backslashes inside the python source
_TOKEN_RE_SQL = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


@register(
    "text_token_stats",
    tier="D",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id, lang, source, text,
             length(text) AS n_chars,
             regexp_split_to_array(trim(lower(text)), '\s+') AS ws
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars,
           len(ws) AS n_words,
           len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n_tokens,
           len(list_filter(ws, w -> w IN ({_STOP_SQL}))) AS n_stopwords,
           ROUND(CAST(n_chars AS DOUBLE) / len(ws), 6) AS avg_word_len,
           ROUND(CAST(len(list_filter(ws, w -> w IN ({_STOP_SQL}))) AS DOUBLE) / len(ws), 6) AS stopword_ratio
    FROM base
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: per-document token statistics — whitespace words, BPE-ish
    regex tokens, stopword ratio.  Pure built-in functions, fully
    parallel, no shuffle."""
    return TX.token_stats(io.table(spark, sf_dir, "documents"))


@register(
    "text_quality_score",
    tier="D",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE) AS n_words,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
             CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                  w -> w IN ({_STOP_SQL}))) AS DOUBLE) AS n_stop
      FROM documents
    ),
    scores AS (
      SELECT doc_id, lang,
             least(n_words / 100.0, 1.0) AS len_score,
             least(n_stop / greatest(n_words, 1.0) * 4, 1.0) AS stop_score,
             least(n_punct / greatest(n_chars, 1.0) * 10, 1.0) AS punct_penalty
      FROM base
    )
    SELECT doc_id, lang,
           ROUND(0.4 * len_score + 0.4 * stop_score + 0.2 * (1 - punct_penalty), 6) AS quality_score,
           ROUND(len_score, 6) AS len_score,
           ROUND(stop_score, 6) AS stop_score,
           ROUND(punct_penalty, 6) AS punct_penalty
    FROM scores
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length band + stopword density + punctuation
    penalty -> [0,1] heuristic (the pre-training filter shape)."""
    return TX.quality_score(io.table(spark, sf_dir, "documents"))


@register(
    "text_lang_id",
    tier="D",
    oracle=r"""
    WITH words AS (
      SELECT doc_id, lang, unnest(regexp_split_to_array(lower(text), '\s+')) AS word
      FROM documents
    ),
    wordsf AS (SELECT * FROM words WHERE word <> ''),
    freq AS (SELECT lang, word, COUNT(*) AS n FROM wordsf GROUP BY 1, 2),
    profile AS (
      SELECT lang AS profile_lang, word FROM (
        SELECT lang, word, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rk
        FROM freq
      ) WHERE rk <= 20
    ),
    doc_words AS (SELECT DISTINCT doc_id, word FROM wordsf),
    votes AS (
      SELECT dw.doc_id, p.profile_lang, COUNT(*) AS overlap
      FROM doc_words dw JOIN profile p USING (word)
      GROUP BY 1, 2
    ),
    pred AS (
      SELECT doc_id, profile_lang, overlap FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY overlap DESC, profile_lang) AS rk
        FROM votes
      ) WHERE rk = 1
    )
    SELECT d.doc_id, d.lang,
           COALESCE(p.profile_lang, 'unknown') AS predicted_lang,
           COALESCE(p.overlap, 0) AS overlap,
           d.lang = COALESCE(p.profile_lang, 'unknown') AS correct
    FROM documents d LEFT JOIN pred p USING (doc_id)
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by corpus-learned function-word profiles (top-20
    words per lang, broadcast) — majority-vote classification with
    deterministic tie-breaks.  Profiles are tiny -> broadcast join;
    one shuffle to tally votes per doc."""
    return TX.lang_id_ngram(io.table(spark, sf_dir, "documents"), profile_size=20)


@register(
    "text_fingerprint_rolling",
    tier="D",
    oracle=r"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(regexp_extract_all(text, '[\s\S]'), c -> CAST(ascii(c) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007
           ) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: polynomial rolling hash
    h_{{i+1}} = (31*h_i + byte_i) mod p over the characters — the
    incremental content key (vs sha2) used for shard-local dedup.
    Left-to-right fold in both engines -> identical fingerprints."""
    docs = io.table(spark, sf_dir, "documents")
    chars = F.regexp_extract_all(F.col("text"), F.lit(r"[\s\S]"), F.lit(0))
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % 1_000_000_007,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))
