"""Text-analysis query registrations (beyond-reference ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.text import STOPWORDS, TOKEN_REGEX, fingerprints, language_id, quality_score, token_counts
from ..registry import register
from ..sources.tables import load_table

_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

# shared word-list fragments for the oracles
_W = "list_filter(string_split(text, ' '), w -> length(w) > 0)"
_STOP_RATIO = (
    f"CASE WHEN len({_W}) = 0 THEN 0.0 ELSE "
    f"len(list_filter({_W}, x -> lower(x) IN ({_STOP_IN}))) * 1.0 / len({_W}) END"
)


@register(
    "text_language_id",
    f"""
    SELECT doc_id AS id, round({_STOP_RATIO}, 6) AS stop_ratio,
           CASE WHEN {_STOP_RATIO} >= 0.05 THEN 'en' ELSE 'other' END AS lang_pred
    FROM documents
    """,
)
def text_language_id(spark, sf_dir):
    return language_id(load_table(spark, sf_dir, "documents"), "doc_id", "text")


_PUNCT = (
    "CASE WHEN length(text) = 0 THEN 0.0 ELSE "
    "length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0 / length(text) END"
)


@register(
    "text_quality_score",
    f"""
    SELECT doc_id AS id,
           round(least(length(text) / 500.0, 1.0), 6) AS len_score,
           round({_STOP_RATIO}, 6) AS stop_ratio,
           round({_PUNCT}, 6) AS punct_ratio,
           round(CASE WHEN len({_W}) = 0 THEN 0.0 ELSE
             list_sum(list_transform({_W}, x -> CAST(length(x) AS DOUBLE)))
             / len({_W}) END, 6) AS avg_word_len,
           round(least(length(text) / 500.0, 1.0) * 0.4
                 + least({_STOP_RATIO} * 10, 1.0) * 0.3
                 + (1 - least({_PUNCT} * 10, 1.0)) * 0.3, 6) AS quality
    FROM documents
    """,
)
def text_quality_score(spark, sf_dir):
    return quality_score(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_token_counts",
    f"""
    SELECT doc_id AS id,
           CAST(len({_W}) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT)
             AS regex_tokens
    FROM documents
    """,
)
def text_token_counts(spark, sf_dir):
    return token_counts(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_fingerprints",
    f"""
    SELECT doc_id AS id,
           md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
           list_min(list_transform({_W}, x -> md5(lower(x)))) AS min_word_hash
    FROM documents
    """,
)
def text_fingerprints(spark, sf_dir):
    return fingerprints(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_unigram_logprob",
    # Corpus-LM quality score (the CCNet/perplexity-filter shape with a
    # unigram model): p(w) from corpus counts, per-doc mean -ln p(w) —
    # high = rare-word-heavy docs. The corpus-wide word table broadcasts
    # (vocab, not rows); everything stays native expressions.
    """
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), wf AS (SELECT word, count(*) AS n FROM w GROUP BY word),
    tot AS (SELECT sum(n) AS total FROM wf)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln(wf.n * 1.0 / tot.total)), 6) AS mean_neg_logprob
    FROM w JOIN wf ON w.word = wf.word CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    wf = w.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    tot = wf.agg(F.sum("n").alias("total"))
    return (
        w.join(F.broadcast(wf), "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("n") * 1.0 / F.col("total"))), 6).alias(
                "mean_neg_logprob"
            ),
        )
    )
