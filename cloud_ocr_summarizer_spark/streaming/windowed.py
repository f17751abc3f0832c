"""Watermarked event-time windowed aggregation (Structured Streaming).

The reference has no streaming operators (SURVEY.md §2.10); this is part
of the training-data-pipeline surface: event streams aggregated into
tumbling event-time windows with a watermark bounding state and dropping
late data.

Semantics under append mode:

* a window's row is emitted only once the watermark (max event time seen
  minus ``late_threshold``) passes the window end — i.e. results are
  FINAL, never updated;
* events arriving after the watermark passed their window are DROPPED —
  bounded state at 100 TB (without the watermark the state store would
  hold every window forever).

Tested in tests/test_streaming.py by running the same input through the
batch twin (groupBy(window(...))) and through two AvailableNow drains
with a late file landing in between.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # watermarks require TIMESTAMP (tz-aware); NTZ event sources must
        # cast before entering the stream
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def windowed_counts(events: DataFrame, *, window_size: str = "1 hour") -> DataFrame:
    """The aggregation shared by the stream and its batch twin:
    (window_start, window_end, event_type, n_events, total_value)."""
    return (
        events.groupBy(F.window("ts", window_size), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def start_windowed_counts(
    spark: SparkSession,
    *,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window_size: str = "1 hour",
    late_threshold: str = "30 minutes",
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """AvailableNow drain: file-source stream -> watermark -> tumbling
    window counts -> exactly-once parquet sink (append mode: each
    finalized window is written once, ever, across restarts).

    ``max_files_per_trigger`` bounds each micro-batch; the watermark only
    advances BETWEEN micro-batches, so a window finalizes once a later
    batch has pushed max(event_time) - late_threshold past its end.
    """
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    agg = windowed_counts(stream.withWatermark("ts", late_threshold),
                          window_size=window_size)
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
