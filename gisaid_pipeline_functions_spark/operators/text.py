"""Text-analysis operators for training-data pipelines (beyond-reference;
BASELINE.json north star): language-ID heuristic, quality scoring, token
counting, document fingerprinting.

All native Column expressions — these run per-document over the full
corpus, so Python-per-row would be the classic 100 TB mistake.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny English function-word list for the n-gram/stopword heuristic
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# BPE-ish tokenizer: letter runs, digit runs, single punctuation
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def words(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda w: F.length(w) > 0)


def stopword_ratio(text: Column) -> Column:
    w = words(text)
    n_stop = F.size(F.filter(w, lambda x: F.lower(x).isin(*STOPWORDS)))
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(n_stop / F.size(w))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, "[a-zA-Z0-9\\s]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(stripped) / F.length(text)
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: function-word density → 'en' vs 'other'.
    (The container has no langdetect libs; this is the n-gram-heuristic
    path a real pipeline would seed before a model-based pass.)"""
    ratio = stopword_ratio(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.round(ratio, 6).alias("stop_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite quality score from length / punctuation / stopword
    signals, each normalized to [0,1].

    The word array is materialized once as a column — referencing the
    ``split()`` expression from five derived expressions would re-tokenize
    the text five times per row."""
    text = F.col(text_col)
    staged = df.select(
        F.col(id_col).alias("id"),
        F.length(text).alias("n"),
        words(text).alias("w"),
        punct_ratio(text).alias("punct"),
    )
    w = F.col("w")
    n_stop = F.size(F.filter(w, lambda x: F.lower(x).isin(*STOPWORDS)))
    stop = F.when(F.size(w) == 0, F.lit(0.0)).otherwise(n_stop / F.size(w))
    len_score = F.least(F.col("n") / F.lit(500.0), F.lit(1.0))
    avg_wlen = F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x)) / F.size(w)
    )
    staged = staged.select(
        "id",
        F.round(len_score, 6).alias("len_score"),
        F.round(stop, 6).alias("stop_ratio"),
        F.round(F.col("punct"), 6).alias("punct_ratio"),
        F.round(avg_wlen, 6).alias("avg_word_len"),
        F.round(
            len_score * 0.4
            + F.least(stop * 10, F.lit(1.0)) * 0.3
            + (1 - F.least(F.col("punct") * 10, F.lit(1.0))) * 0.3,
            6,
        ).alias("quality"),
    )
    return staged


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(words(text)).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))
        .cast("long")
        .alias("regex_tokens"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprints: md5 of the normalized text (exact-dup key)
    plus the min word-hash (a 1-gram minhash, the rolling-hash-min analog
    used by winnowing-style schemes)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    w = words(F.col(text_col))
    min_word_hash = F.array_min(F.transform(w, lambda x: F.md5(F.lower(x))))
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(norm).alias("fingerprint"),
        min_word_hash.alias("min_word_hash"),
    )
