"""Structured Streaming variant of the extraction job.

The reference is purely batch (SURVEY.md §2.10); the north rule's
resumability is covered by the snapshot/anti-join path in
sources/checkpoint.py.  This module is the optional streaming stretch:
a file-source stream over the input directory, the SAME row-local
extraction transformation, and an exactly-once file sink driven by
``Trigger.AvailableNow`` — i.e. "process whatever has landed since the
last checkpoint, then stop", the streaming twin of batch-incremental.

Because extraction is a stateless per-row transform, no watermark or
state store is needed; Spark's source offsets + sink commit log give
exactly-once across restarts (the checkpointLocation carries resume
state instead of our manifest).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from cloud_ocr_summarizer_spark.operators.extract import extract_spans

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def start_incremental_extract(
    spark: SparkSession,
    *,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    min_confidence: float = 0.0,
) -> StreamingQuery:
    """Start an AvailableNow streaming extraction over a parquet directory.

    Each invocation drains newly-arrived files and stops; re-invoking after
    more files land continues from the stream checkpoint — no reprocessing,
    no duplicates (exactly-once file sink).
    """
    stream = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    extracted = extract_spans(stream, min_confidence=min_confidence)
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
