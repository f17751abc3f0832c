"""Skew handling for media-heavy documents (SURVEY.md §4.3(1)).

Two distinct skew shapes, two tools:

* ``salted_repartition`` — KEY-frequency skew (many rows per key): spread
  a hot key over ``salt_buckets`` partitions by hashing (key, salt).
* ``split_heavy_docs`` / ``reassemble_chunks`` — ROW-size skew (one row
  with 10^5 media spans serializes one task): row-locally split oversized
  span arrays into chunk rows before a batch UDF stage, then window-merge
  the chunks back.  The 0.1% skew-cluster docs in FIXTURES.md §1 are the
  target.

Both are explicit pipeline operators, not Catalyst rules; AQE skew-join
splitting remains the backstop for join-side skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from cloud_ocr_summarizer_spark import config


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    key: str = "doc_id",
    salt_buckets: int = config.DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """repartition on (hash(key), salt): hot keys fan out over
    ``salt_buckets`` partitions; distinct keys stay uniformly spread.

    The salt MUST vary within a key (a key-derived salt is a no-op — every
    row of the hot key would get the same salt); a row-sequence salt only
    affects physical placement, never values, so downstream results stay
    deterministic.
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.xxhash64(F.col(key)), salt)


def split_heavy_docs(
    df: DataFrame,
    *,
    spans_col: str = "spans",
    max_spans_per_chunk: int = 1024,
) -> DataFrame:
    """(doc_id, spans) -> (doc_id, chunk_id, spans): arrays longer than
    ``max_spans_per_chunk`` become multiple rows.  Row-local (one explode,
    no shuffle); light docs pass through as chunk 0.
    """
    k = max_spans_per_chunk
    n = F.size(F.col(spans_col))
    n_chunks = F.greatest(F.ceil(n / F.lit(k)).cast("int"), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.struct(
            c.cast("int").alias("chunk_id"),
            F.slice(F.col(spans_col), c.cast("int") * k + 1, k).alias("chunk"),
        ),
    )
    return df.select(
        "doc_id", F.explode(chunks).alias("c")
    ).select(
        "doc_id", F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk").alias("spans")
    )


def reassemble_chunks(
    df: DataFrame, *, spans_col: str = "spans_out"
) -> DataFrame:
    """Merge chunk rows back into one ordered spans array per doc.

    Deterministic: chunks concatenated in chunk_id order (flatten over an
    ordered collect_list window), then a final sort by (offset, ...) key is
    the caller's extract step — chunk boundaries were offset-ordered only
    within each chunk.
    """
    w = (
        Window.partitionBy("doc_id")
        .orderBy("chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    merged = df.withColumn("all_spans", F.flatten(F.collect_list(spans_col).over(w)))
    return (
        merged.groupBy("doc_id")
        .agg(F.first("all_spans").alias(spans_col))
    )
