"""Driver-checkable queries: one per implemented operator family.

Every function here takes (spark, sf_dir) and returns a DataFrame; most have
an ANSI-SQL twin in ``oracles.py`` that DuckDB runs on the same parquet —
the pair IS the correctness gate (driver compares row count + schema +
order-insensitive value hash).  Conventions to keep the two sides
hash-identical:

* alias every computed column, same name both sides;
* round every float aggregate to a fixed number of decimals BOTH sides;
* deterministic total ordering before any row_number / top-k cutoff.

SURVEY.md §2 operator ids are cited per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloud_ocr_summarizer_spark import config
from cloud_ocr_summarizer_spark.datagen import derive_spans_from_documents
from cloud_ocr_summarizer_spark.functions.text import (
    mime_for_name_col,
    normalize_block_text_col,
    token_count_col,
    whitespace_tokens_col,
)
from cloud_ocr_summarizer_spark.operators.extract import (
    extract_span_rows,
    extract_spans,
)


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _documents_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> interleaved (doc_id, spans) via the deterministic deriver."""
    return derive_spans_from_documents(_read(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# extraction family (S1-S3, P1-P4, E1-E6)
# ---------------------------------------------------------------------------
def q_extract_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: derive interleaved spans, extract, emit ordered span rows.

    Exercises the full row-local pipeline (E1-E6 + P2): classification,
    text assembly, offset-ordered reassembly, positional seq numbering.
    """
    return extract_span_rows(_documents_spans(spark, sf_dir))


def q_assemble_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2-E4 text assembly + A2 token count applied to raw document text."""
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        normalize_block_text_col(F.col("text")).alias("clean_text"),
        F.size(whitespace_tokens_col(F.col("text"))).alias("n_tokens"),
    )


def q_doc_structure_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A5 structure stats per document over the derived span table."""
    rows = extract_span_rows(_documents_spans(spark, sf_dir))
    return rows.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("kind").isin(*config.TEXT_KINDS), 1).otherwise(0)).alias(
            "n_text_spans"
        ),
        F.sum(F.when(F.col("kind").isin(*config.MEDIA_KINDS), 1).otherwise(0)).alias(
            "n_media_spans"
        ),
        F.sum(
            F.when(
                F.col("text").isNotNull(), token_count_col(F.col("text"))
            ).otherwise(0)
        ).alias("n_tokens"),
    )


def q_rollup_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 rollup: '\\n'-join of text spans in offset order iff >1 contributes
    (gemini.py:76-83).  Row-local: filter + array_join on the ordered array."""
    extracted = extract_spans(_documents_spans(spark, sf_dir), with_stats=False)
    texts = F.filter(
        F.col("spans_out"),
        lambda s: s["text"].isNotNull() & (s["text"] != F.lit("")),
    )
    return extracted.select(
        "doc_id",
        F.when(F.size(texts) > 1, F.array_join(F.transform(texts, lambda s: s["text"]), "\n"))
        .alias("rollup_text"),
        F.size(texts).alias("n_contributing"),
    )


def q_mime_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 mime dispatch over media refs of the derived spans."""
    rows = extract_span_rows(_documents_spans(spark, sf_dir))
    media = rows.filter(F.col("media_ref").isNotNull())
    return (
        media.select(mime_for_name_col(F.col("media_ref")).alias("mime"))
        .groupBy("mime")
        .agg(F.count("*").alias("n_refs"))
    )


def q_size_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 size gate analogue: per-doc byte size + within-limit flag."""
    docs = _read(spark, sf_dir, "documents")
    limit = 1500  # bytes; small so both branches appear at sf0.01
    return docs.select(
        "doc_id",
        F.octet_length("text").alias("text_bytes"),
        (F.octet_length("text") <= F.lit(limit)).alias("within_limit"),
    )


def q_confidence_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 confidence gate: deterministic synthetic confidence per span,
    drop below 0.7, count survivors per doc."""
    rows = extract_span_rows(_documents_spans(spark, sf_dir))
    conf = F.pmod(F.col("doc_id") * 7 + F.col("offset") * 13, F.lit(100)) / 100.0
    return (
        rows.withColumn("confidence", conf)
        .filter(F.col("confidence") >= 0.7)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.avg("confidence"), 4).alias("avg_conf"),
        )
    )


def q_primary_language_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 top-1 selection: per source, the language with the greatest total
    n_chars (deterministic tie-break on lang asc)."""
    docs = _read(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(F.sum("n_chars").alias("chars"))
    w = Window.partitionBy("source").orderBy(F.col("chars").desc(), F.col("lang").asc())
    return (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("primary_lang"), "chars")
    )


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/T2 latest-artifact: newest event per user (ts desc, id desc)."""
    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            # epoch micros via NTZ-NTZ diff: TZ-proof cross-engine compare
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("ts_us"),
        )
    )


BATCH_1 = {
    "extract_flagship": q_extract_flagship,
    "assemble_normalize": q_assemble_normalize,
    "doc_structure_stats": q_doc_structure_stats,
    "rollup_per_doc": q_rollup_per_doc,
    "mime_dispatch": q_mime_dispatch,
    "size_gate": q_size_gate,
    "confidence_filter": q_confidence_filter,
    "primary_language_by_source": q_primary_language_by_source,
    "latest_event_per_user": q_latest_event_per_user,
}
