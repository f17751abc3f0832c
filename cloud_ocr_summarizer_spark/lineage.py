"""Per-partition lineage metrics (north_rule; FIXTURES.md §4).

Schema: (run_id, snapshot_id, partition_id, doc_count, span_count, bytes,
wall_time_s) — one row per input partition of the extraction job.

Cheap path: ``partition_metrics`` aggregates by spark_partition_id() —
pure DataFrame, one extra agg over the same scan.  Timed path:
``timed_partition_metrics`` measures wall time inside a mapInPandas pass
(per-partition side-channel emitted as tagged rows — no driver accumulators,
works at any executor count).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("doc_count", T.LongType()),
        T.StructField("span_count", T.LongType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("wall_time_s", T.DoubleType()),
    ]
)


def partition_metrics(
    extracted: DataFrame, *, run_id: str, snapshot_id: int = 0
) -> DataFrame:
    """Lineage rows via groupBy(spark_partition_id()) over the extracted
    output (doc_id, spans_out).  wall_time_s is null on this cheap path."""
    span_bytes = F.aggregate(
        F.col("spans_out"),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.coalesce(F.octet_length(s["text"]), F.lit(0))
        + F.coalesce(F.octet_length(s["media_ref"]), F.lit(0)),
    )
    return (
        extracted.select(
            F.spark_partition_id().alias("partition_id"),
            F.size("spans_out").alias("n_spans"),
            span_bytes.alias("n_bytes"),
        )
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_spans").cast("long").alias("span_count"),
            F.sum("n_bytes").cast("long").alias("bytes"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(snapshot_id).cast("long").alias("snapshot_id"),
            "partition_id",
            "doc_count",
            "span_count",
            "bytes",
            F.lit(None).cast("double").alias("wall_time_s"),
        )
    )


def timed_partition_metrics(
    extracted: DataFrame, *, run_id: str, snapshot_id: int = 0
) -> DataFrame:
    """Lineage rows measured inside the tasks (mapInPandas side-channel):
    includes real per-partition wall time.

    Span/byte counting runs JVM-side (the same codegen'd octet_length
    aggregate as the cheap path) BEFORE the Python stage; the pandas task
    only sums two int columns and stamps the clock.  Because Spark
    pipelines the upstream computation into this task's iterator, the
    measured wall time still covers the partition's full compute, but the
    Python side never touches a span (the old version looped every span
    of every row in Python — ~the whole job's cost a second time).
    """
    span_bytes = F.aggregate(
        F.col("spans_out"),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.coalesce(F.octet_length(s["text"]), F.lit(0))
        + F.coalesce(F.octet_length(s["media_ref"]), F.lit(0)),
    )
    pre = extracted.select(
        F.size("spans_out").cast("long").alias("n_spans"),
        span_bytes.alias("n_bytes"),
    )

    def measure(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        t0 = time.monotonic()
        docs = 0
        spans = 0
        nbytes = 0
        for pdf in batches:
            docs += len(pdf)
            spans += int(pdf["n_spans"].sum())
            nbytes += int(pdf["n_bytes"].sum())
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame(
            {
                "run_id": [run_id],
                "snapshot_id": [snapshot_id],
                "partition_id": [pid],
                "doc_count": [docs],
                "span_count": [spans],
                "bytes": [nbytes],
                "wall_time_s": [time.monotonic() - t0],
            }
        )

    return pre.mapInPandas(measure, schema=LINEAGE_SCHEMA)
