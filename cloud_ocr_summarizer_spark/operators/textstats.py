"""Text-analysis operators for corpus curation: language ID, quality
scoring, token counting, document fingerprinting.

All row-local column expressions (zero shuffles until the caller
aggregates); deterministic; SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cloud_ocr_summarizer_spark.functions.text import (
    normalize_block_text_col,
    whitespace_tokens_col,
)

# Tiny English stopword list (public, frequency-based); the heuristic is a
# ratio, so the list just needs to be fixed and shared with the oracle SQL.
EN_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")


def stopword_ratio_col(text: Column) -> Column:
    """share of tokens that are English stopwords (language-ID heuristic)."""
    words = whitespace_tokens_col(F.lower(text))
    n = F.size(words)
    hits = F.size(F.filter(words, lambda w: w.isin(*EN_STOPWORDS)))
    return F.when(n > 0, F.round(hits / n, 4)).otherwise(F.lit(0.0))


def quality_score_col(text: Column) -> Column:
    """Composite quality score in [0,1]: rewards reasonable length and word
    size, penalizes non-alphanumeric density (boilerplate/markup signal).

    score = 0.4*min(n_tokens/100, 1) + 0.3*(1 - punct_ratio)
          + 0.3*min(avg_word_len/8, 1)
    Returned as integer basis points (floor(score * 10000)).
    """
    words = whitespace_tokens_col(text)
    n_tokens = F.size(words)
    n_chars = F.length(F.coalesce(text, F.lit("")))
    n_punct = n_chars - F.length(
        F.regexp_replace(F.coalesce(text, F.lit("")), r"[^A-Za-z0-9\s]", "")
    )
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    avg_word_len = F.when(
        n_tokens > 0,
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)) / n_tokens,
    ).otherwise(F.lit(0.0))
    score = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (1 - punct_ratio)
        + 0.3 * F.least(avg_word_len / F.lit(8.0), F.lit(1.0))
    )
    # basis points via floor: round() half-breaking differs across engines
    # (Spark HALF_UP vs DuckDB) exactly at .xxxx5 values
    return F.floor(score * 10000).cast("int")


def fingerprint_col(text: Column) -> Column:
    """Content fingerprint: md5 of the NORMALIZED text (whitespace-
    insensitive), truncated to 16 hex chars — stable doc identity for
    dedup/lineage joins."""
    return F.substring(F.md5(normalize_block_text_col(text).cast("binary")), 1, 16)


def text_profile(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document text-analysis profile (one row-local projection)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(whitespace_tokens_col(t)).alias("n_tokens"),
        stopword_ratio_col(t).alias("stopword_ratio"),
        (stopword_ratio_col(t) >= 0.05).alias("looks_english"),
        quality_score_col(t).alias("quality_score"),
        fingerprint_col(t).alias("fingerprint"),
    )
