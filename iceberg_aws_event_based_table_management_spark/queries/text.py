"""Tier D — text-analysis queries (SURVEY.md SS2-D D5 + BASELINE.json:
language-ID, quality scoring, token counting, fingerprinting).
Engine logic in operators/text.py.
"""

from __future__ import annotations

import functools

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


# words → profiles → per-doc predicted language CTE chain (no WITH /
# no final select) — shared with the confusion matrix in pipeline_ext7.
_LANGID_PRED_CTE = r"""
    words AS (
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
    )"""


@register(
    "text_lang_id",
    tier="D",
    oracle="WITH "
    + _LANGID_PRED_CTE
    + r"""
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


@register(
    "pipeline_training_corpus",
    tier="D",
    oracle=rf"""
    WITH duped AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, lang, text FROM documents WHERE doc_id % 10 = 0
    ),
    survivors AS (
      SELECT MIN(doc_id) AS doc_id FROM duped GROUP BY sha256(text)
    ),
    corpus AS (
      SELECT d.doc_id, d.lang, d.text FROM duped d JOIN survivors s ON d.doc_id = s.doc_id
    ),
    scored AS (
      SELECT doc_id, lang, text,
             CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE) AS n_words,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
             CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                  w -> w IN ({_STOP_SQL}))) AS DOUBLE) AS n_stop
      FROM corpus
    ),
    quality AS (
      SELECT doc_id, lang, text,
             ROUND(0.4 * least(n_words / 100.0, 1.0)
                 + 0.4 * least(n_stop / greatest(n_words, 1.0) * 4, 1.0)
                 + 0.2 * (1 - least(n_punct / greatest(n_chars, 1.0) * 10, 1.0)), 6) AS q
      FROM scored
    ),
    kept AS (
      SELECT doc_id, lang, q,
             len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n_tokens
      FROM quality WHERE q >= 0.5
    )
    SELECT k.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(CAST(ROUND(q * 1000000, 0) AS BIGINT)) AS DOUBLE)
                 / 1000000.0 / COUNT(*), 6) AS avg_quality,
           COUNT(e.vec_id) AS n_with_embedding
    FROM kept k LEFT JOIN embeddings e ON k.doc_id = e.vec_id
    GROUP BY k.lang
    """,
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship Tier-D composition — the training-data pipeline end to
    end: re-ingested corpus -> exact dedup (sha256 survivor) ->
    quality filter (q >= 0.5) -> token counting -> embedding coverage
    join -> per-language corpus stats.  Every stage is the registered
    operator it names (dedup_exact_documents, text_quality_score,
    text_token_stats, multimodal_join_docs_embeddings); the pipeline
    proves they compose.  One shuffle per stage boundary that needs
    one (dedup window, final groupBy); the quality/token maps are
    shuffle-free; the embedding join broadcasts at small sf and
    shuffles on doc_id at scale.  avg_quality accumulates as unscaled
    longs (order-independent, see aggregates.py)."""
    from ..operators import dedup as D
    from ..operators import text as TXo

    docs = io.table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    dups = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    duped = docs.unionByName(dups)

    # exact-dedup survivor via window rank over the hash partition:
    # ONE shuffle and one text scan, vs the groupBy+semi-join shape's
    # two scans + two shuffles (measured 2.1x slower at sf0.1)
    corpus = D.exact_dedup(duped).select("doc_id", "lang", "text")

    # quality + token columns are map-side expressions added in place —
    # never a join of the corpus against a projection of itself (that
    # shape costs two full-corpus shuffles at scale for nothing).
    kept = (
        corpus.withColumn("quality_score", TXo.quality_score_col())
        .withColumn("n_tokens", TXo.token_count_col())
        .filter(F.col("quality_score") >= 0.5)
    )
    emb = io.table(spark, sf_dir, "embeddings").select(F.col("vec_id"))
    return (
        kept.join(emb, kept.doc_id == emb.vec_id, "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(
                F.sum(F.round(F.col("quality_score") * 1_000_000, 0).cast("long")).cast(
                    "double"
                )
                / 1_000_000.0
                / F.count("*"),
                6,
            ).alias("avg_quality"),
            F.count("vec_id").alias("n_with_embedding"),
        )
    )


@register(
    "text_repetition_stats",
    tier="D",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
      FROM documents
    ),
    bg AS (
      SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bigram
      FROM base, unnest(range(1, len(ws))) AS t(i)
    ),
    freq AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    top AS (SELECT doc_id, MAX(c) AS top_c FROM freq GROUP BY 1)
    SELECT b.doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           ROUND(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 6) AS dup_word_ratio,
           ROUND(CAST(COALESCE(top_c, 0) AS DOUBLE) / (len(ws) - 1), 6) AS top_bigram_ratio
    FROM base b LEFT JOIN top USING (doc_id)
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 pipeline op: Gopher-style repetition signals — duplicate-word
    ratio and top-bigram multiplicity ratio, the intra-document
    degeneracy filters a pre-training pipeline applies after exact
    dedup.  The Spark side computes the bigram mode WITHOUT a shuffle
    (sort the per-row bigram array, fold the longest equal-run) — the
    oracle uses the explode->groupBy form, which shuffles every bigram
    and is the shape this operator deliberately avoids at 100 TB."""
    return TX.repetition_stats(io.table(spark, sf_dir, "documents"))


@register(
    "text_heuristic_filter",
    tier="D",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS ws,
             len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                      list_transform(ws, w -> CAST(length(w) AS BIGINT))),
                    (a, x) -> a + x) AS DOUBLE) / len(ws) AS mwl,
             CAST(n_punct AS DOUBLE) / len(ws) AS sym,
             len(list_filter(ws, w -> w IN ({_STOP_SQL}))) >= 1 AS has_stop
      FROM base
    )
    SELECT doc_id, n_words,
           ROUND(mwl, 6) AS mean_word_len,
           ROUND(sym, 6) AS symbol_word_ratio,
           has_stop AS has_stopword,
           (mwl >= 3.0 AND mwl <= 10.0 AND sym <= 0.2 AND n_words >= 50 AND has_stop) AS keep
    FROM m
    """,
)
def text_heuristic_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 pipeline op: C4-style heuristic cleanup decision — mean word
    length band, symbol ratio, word-count floor, function-word presence.
    Pure map-side built-ins; the word-length sum is an exact integer
    fold, so the mean is one correctly-rounded division per engine."""
    return TX.heuristic_filter(io.table(spark, sf_dir, "documents"))


@register(
    "text_chunk_overlap",
    tier="D",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
      FROM documents
    )
    SELECT doc_id,
           s // 24 AS chunk_id,
           array_to_string(list_slice(ws, s + 1, s + 32), ' ') AS chunk_text,
           CAST(least(len(ws) - s, 32) AS BIGINT) AS n_chunk_words
    FROM base, unnest(range(0, len(ws), 24)) AS t(s)
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping word-window chunking (chunk_size=32, stride=24) —
    the RAG/context-window splitter.  sequence+transform+posexplode is
    a pure map-side generator: no shuffle at any corpus size, and the
    chunk rows inherit the input partitioning so a downstream
    per-chunk embed step needs no repartition."""
    return TX.chunk_documents(io.table(spark, sf_dir, "documents"), chunk_size=32, stride=24)


@functools.lru_cache(maxsize=None)
def _rag_chunk_cols() -> tuple:
    """(n_chunks_doc, chunk_words_doc) for the E31 chunk accounting —
    input-independent Column templates built once per process (guide
    §1 build cost; the operators/text.py memo note).  The expression
    trees are identical to the former inline construction, so the
    plan is bit-identical."""
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n_words = F.size(words)
    starts = F.sequence(F.lit(0), n_words - 1, F.lit(24))
    chunk_words = F.aggregate(
        starts,
        F.lit(0).cast("long"),
        lambda a, s: a + F.least(n_words - s, F.lit(32)).cast("long"),
    )
    return F.size(starts).cast("long"), chunk_words


@register(
    "pipeline_rag_corpus",
    tier="D",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id, source,
             regexp_split_to_array(trim(lower(text)), '\s+') AS ws,
             len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
      FROM documents
    ),
    bg AS (
      SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bigram
      FROM base, unnest(range(1, len(ws))) AS t(i)
    ),
    topb AS (
      SELECT doc_id, MAX(c) AS top_c
      FROM (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1
    ),
    m AS (
      SELECT b.doc_id, b.source, len(ws) AS n_words,
             CAST(list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                      list_transform(ws, w -> CAST(length(w) AS BIGINT))),
                    (a, x) -> a + x) AS DOUBLE) / len(ws) AS mwl,
             CAST(n_punct AS DOUBLE) / len(ws) AS sym,
             len(list_filter(ws, w -> w IN ({_STOP_SQL}))) >= 1 AS has_stop,
             ROUND(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 6) AS dup_r,
             ROUND(CAST(COALESCE(top_c, 0) AS DOUBLE) / (len(ws) - 1), 6) AS top_r
      FROM base b LEFT JOIN topb USING (doc_id)
    ),
    kept AS (
      SELECT doc_id, source, n_words FROM m
      WHERE mwl >= 3.0 AND mwl <= 10.0 AND sym <= 0.2 AND n_words >= 50 AND has_stop
        AND dup_r <= 0.6 AND top_r <= 0.1
    ),
    chunks AS (
      SELECT doc_id, source, CAST(least(n_words - s, 32) AS BIGINT) AS n_chunk_words
      FROM kept, unnest(range(0, n_words, 24)) AS t(s)
    )
    SELECT source,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_chunks,
           CAST(SUM(n_chunk_words) AS BIGINT) AS total_chunk_words,
           ROUND(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT doc_id), 6) AS chunks_per_doc
    FROM chunks GROUP BY source
    """,
)
def pipeline_rag_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composition #2 — the RAG-ingest pipeline: C4 heuristic
    cleanup (E30) AND Gopher repetition filter (E29) applied in place
    as map-side predicates, then per-source chunk accounting for the
    E31 chunker (chunk_size=32, stride=24).

    Scale shape: zero corpus self-joins (both filters are bare-column
    conjunctions on the scan), and the chunk counts/word totals are
    computed as a map-side FOLD over the chunk-start array — the chunk
    rows never materialize and no count-distinct expansion is needed,
    so the whole pipeline is scan -> filter -> project -> partial agg
    -> ONE shuffle.  (The oracle aggregates the exploded chunk rows —
    same numbers, the shape this plan deliberately avoids.)"""
    docs = io.table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    kept = docs.filter(TX.heuristic_keep_col() & TX.repetition_keep_col())
    n_chunks_doc, chunk_words_doc = _rag_chunk_cols()
    per_doc = kept.select(
        "source",
        n_chunks_doc.alias("n_chunks_doc"),
        chunk_words_doc.alias("chunk_words_doc"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chunks_doc").cast("long").alias("n_chunks"),
        F.sum("chunk_words_doc").cast("long").alias("total_chunk_words"),
        F.round(
            F.sum("n_chunks_doc").cast("double") / F.count("*"), 6
        ).alias("chunks_per_doc"),
    )


@register(
    "text_pii_redact",
    tier="D",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) ||
             '@example.com call +1-555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text, '\+1-555-[0-9]{4}')) AS n_phones,
           regexp_replace(
             regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
             '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS redacted
    FROM aug
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 pipeline op: PII redaction — mask emails/phones with typed
    placeholders before training.  The fixture corpus is synthetic, so
    deterministic PII is injected per doc first (doc_id-derived email +
    phone), then counted and masked.  All regexp expressions: map-side,
    no shuffle, linear at any corpus size."""
    docs = io.table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return TX.redact_pii(docs).select("doc_id", "n_emails", "n_phones", "redacted")


# Hashed-feature linear classifier: bucket = 60-bit engine-neutral
# word hash mod _CLF_BUCKETS; weight = a pure integer function of the
# bucket (LCG step), standing in for trained fasttext-style weights.
# Everything until the final divide is int64, so both engines agree
# bit for bit.
_CLF_BUCKETS = 4096
_CLF_HASH_SQL = (
    "CAST(list_reduce(string_split('0' || substr(md5({w}), 1, 15), ''), "
    "(acc, c) -> CAST(acc AS BIGINT) * 16 "
    "+ strpos('0123456789abcdef', c) - 1) AS BIGINT)"
)


@register(
    "text_quality_classifier",
    tier="D",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS ws
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(list_sum(list_transform(ws,
               w -> ({_CLF_HASH_SQL.format(w="w")} % {_CLF_BUCKETS})
                    * 48271 % 65537 - 32768)) AS BIGINT) AS raw
      FROM toks
    )
    SELECT doc_id, n_tokens,
           ROUND(CAST(raw AS DOUBLE) / (32768.0 * n_tokens), 6) AS clf_score,
           (CAST(raw AS DOUBLE) / (32768.0 * n_tokens)) >= 0.0 AS keep
    FROM scored
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E69 — model-scored corpus filtering: a hashed-feature linear
    classifier (the fasttext-style quality/toxicity filter every
    production corpus pipeline applies after the heuristic gates)
    evaluated over the whole corpus.  Tokens hash to 4096 buckets
    (engine-neutral 60-bit md5 hash); the per-bucket weight stands in
    for trained coefficients as a pure integer function of the bucket
    (LCG step, int64 end-to-end), so the mean-weight score and the
    keep decision are bit-exact in both engines — swap the weight
    expression for a broadcast weight table to serve a real model.

    Scale shape: ZERO shuffle — tokenize, hash, and fold entirely
    inside a per-row aggregate over the word array (no explode, no
    groupBy); one divide and one round at the end.  This is the
    model-scoring pattern at 100 TB: linear scan, map-side only,
    weights broadcast."""
    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")

    def _weight(w):
        b = F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long") % _CLF_BUCKETS
        return b * 48271 % 65537 - 32768

    raw = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + _weight(w)
    )
    out = docs.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_tokens"),
        raw.alias("raw"),
    )
    score = F.col("raw").cast("double") / (32768.0 * F.col("n_tokens"))
    return out.select(
        "doc_id",
        "n_tokens",
        F.round(score, 6).alias("clf_score"),
        (score >= 0.0).alias("keep"),
    )
