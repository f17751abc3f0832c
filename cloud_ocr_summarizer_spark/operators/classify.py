"""Main-content classification: text-density + link-density scoring
(Readability-style boilerplate stripping), the engine's replacement for the
reference's per-page remote summarization calls (U2, gemini.py:118-133).

Two physical strategies, same semantics (mirrors the reference's
simple/detailed output-mode duality, vision_processor.py:119-122):

* ``content_score_col`` / ``classify_spans_simple`` — pure column
  expressions, JVM-side, zero Python.  Default.
* ``classify_spans_detailed`` — Arrow-batched ``mapInPandas``: whole
  documents arrive as pandas batches; scoring is vectorized numpy/pandas
  string ops (NO per-row Python).  This is the slot where heavier
  DOM/layout parsing plugs in at 100 TB; the batch shape, schema and
  partitioning are what matter.

Scoring contract (pinned by oracle_content_score in tests):
  text_density  = min(n_tokens / 40, 1)
  link_density  = link_tokens / n_tokens          (tokens containing '://'
                                                   or starting 'http')
  punct_density = non-alnum-non-space chars / chars
  score         = 0.5*text_density + 0.3*(1-link_density)
                + 0.2*(1-punct_density)              -> basis points (floor)
  TEXT/TABLE: is_content = score >= 5000 and n_tokens >= 3
  PICTURE/BARCODE: always content (score 10000); others: never (score 0).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from cloud_ocr_summarizer_spark import config
from cloud_ocr_summarizer_spark.functions.text import whitespace_tokens_col

CONTENT_THRESHOLD_BP = 5000
MIN_CONTENT_TOKENS = 3


# ---------------------------------------------------------------------------
# simple mode: column expressions
# ---------------------------------------------------------------------------
def content_score_col(kind: Column, text: Column) -> Column:
    """Content score in basis points, JVM-side."""
    words = whitespace_tokens_col(text)
    n_tokens = F.size(words)
    link_tokens = F.size(
        F.filter(words, lambda w: w.contains("://") | w.startswith("http"))
    )
    n_chars = F.length(F.coalesce(text, F.lit("")))
    # punct count = residue after deleting alnum/ws RUNS (the + matters:
    # single-char classes make the regex engine iterate one replacement
    # per character — measured 17x slower; see textstats.quality_score_col)
    n_punct = F.length(
        F.regexp_replace(F.coalesce(text, F.lit("")), r"[A-Za-z0-9\s]+", "")
    )
    text_density = F.least(n_tokens / F.lit(40.0), F.lit(1.0))
    link_density = F.when(n_tokens > 0, link_tokens / n_tokens).otherwise(F.lit(0.0))
    punct_density = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    score = (
        0.5 * text_density + 0.3 * (1 - link_density) + 0.2 * (1 - punct_density)
    )
    bp = F.floor(score * 10000).cast("int")
    return (
        F.when(kind.isin(*config.MEDIA_KINDS), F.lit(10000))
        .when(kind.isin(*config.TEXT_KINDS), bp)
        .otherwise(F.lit(0))
    )


def is_content_col(kind: Column, text: Column) -> Column:
    n_tokens = F.size(whitespace_tokens_col(text))
    return (
        F.when(kind.isin(*config.MEDIA_KINDS), F.lit(True))
        .when(
            kind.isin(*config.TEXT_KINDS),
            (content_score_col(kind, text) >= CONTENT_THRESHOLD_BP)
            & (n_tokens >= MIN_CONTENT_TOKENS),
        )
        .otherwise(F.lit(False))
    )


def classify_spans_simple(span_rows: DataFrame) -> DataFrame:
    """Append (content_score, is_content) to flat span rows — simple mode."""
    return span_rows.withColumn(
        "content_score", content_score_col(F.col("kind"), F.col("text"))
    ).withColumn("is_content", is_content_col(F.col("kind"), F.col("text")))


# ---------------------------------------------------------------------------
# detailed mode: vectorized pandas over Arrow batches
# ---------------------------------------------------------------------------
def _classified_schema(input_schema: T.StructType) -> T.StructType:
    """Input columns passed through + the two score columns appended —
    works for any doc_id type (string at corpus scale, long in testdata)."""
    return T.StructType(
        list(input_schema.fields)
        + [
            T.StructField("content_score", T.IntegerType()),
            T.StructField("is_content", T.BooleanType()),
        ]
    )


def _score_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized scoring of one Arrow batch of span rows."""
    import numpy as np

    text = pdf["text"].fillna("")
    n_tokens = text.str.count(r"\S+").astype("int64")
    # one match per token starting-position: token starts with 'http' OR
    # contains '://' — same predicate as the JVM/SQL twins, fully vectorized
    link_tokens = text.str.count(r"(?<!\S)(?:http|\S*://)").astype("int64")
    n_chars = text.str.len().astype("int64")
    n_punct = text.str.count(r"[^A-Za-z0-9\s]").astype("int64")
    with np.errstate(divide="ignore", invalid="ignore"):
        text_density = np.minimum(n_tokens / 40.0, 1.0)
        link_density = np.where(n_tokens > 0, link_tokens / n_tokens, 0.0)
        punct_density = np.where(n_chars > 0, n_punct / n_chars, 0.0)
    score = 0.5 * text_density + 0.3 * (1 - link_density) + 0.2 * (1 - punct_density)
    bp = np.floor(score * 10000).astype("int32")
    kind = pdf["kind"]
    is_media = kind.isin(list(config.MEDIA_KINDS))
    is_text = kind.isin(list(config.TEXT_KINDS))
    out = pdf.copy()
    out["content_score"] = np.where(is_media, 10000, np.where(is_text, bp, 0)).astype(
        "int32"
    )
    out["is_content"] = np.where(
        is_media,
        True,
        is_text
        & (out["content_score"] >= CONTENT_THRESHOLD_BP)
        & (n_tokens >= MIN_CONTENT_TOKENS),
    )
    return out


def classify_spans_detailed(span_rows: DataFrame) -> DataFrame:
    """Detailed mode: same contract via mapInPandas (Arrow batches).

    Spans of one document may be split across batches/partitions — the
    scoring is span-local so that's safe; reassembly stays with the
    window path downstream.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _score_batch(pdf)

    return span_rows.mapInPandas(run, schema=_classified_schema(span_rows.schema))


def main_content_rows(span_rows: DataFrame, *, detailed: bool = False) -> DataFrame:
    """Main-content selection: classify then keep content spans only."""
    classified = (
        classify_spans_detailed(span_rows) if detailed else classify_spans_simple(span_rows)
    )
    return classified.filter(F.col("is_content"))
