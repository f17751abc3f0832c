"""Streaming CDC apply: a change stream continuously upserted into a
materialized table via ``foreachBatch``.

``foreachBatch`` is the Structured Streaming escape hatch for sinks that
need MERGE semantics: each micro-batch arrives as a regular DataFrame and
is merged (operators/merge.merge_upsert — updates win on key collision,
latest change per key within the batch wins) into the current state,
which is swapped in atomically (write new version dir, flip a pointer
file — the Iceberg ``MERGE INTO`` stand-in, same commit-visibility rule
as sources/checkpoint.SnapshotSink).

Exactly-once: the stream checkpoint dedupes input files across restarts,
and a batch that crashes mid-write never flips the pointer, so reruns of
the same epoch are idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming import StreamingQuery

from cloud_ocr_summarizer_spark.operators.merge import merge_upsert

_POINTER = "_CURRENT"


def read_current(spark: SparkSession, state_root: str) -> DataFrame | None:
    """The materialized table's current version (None before first merge)."""
    ptr = os.path.join(state_root, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as f:
        version_dir = f.read().strip()
    return spark.read.parquet(version_dir)


def _apply_batch(state_root: str, key: str, order_col: str):
    def apply(batch: DataFrame, epoch_id: int) -> None:
        import shutil
        import uuid

        spark = batch.sparkSession
        # latest change per key within the batch wins (deterministic)
        w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
        latest = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .drop("__rn")
        )
        ptr = os.path.join(state_root, _POINTER)
        prev_dir = None
        if os.path.exists(ptr):
            with open(ptr, encoding="utf-8") as f:
                prev_dir = f.read().strip()
        current = None if prev_dir is None else spark.read.parquet(prev_dir)
        merged = latest if current is None else merge_upsert(current, latest, key=key)
        # unique dir per ATTEMPT: foreachBatch is at-least-once, and a
        # retried epoch must never overwrite the directory the pointer
        # (and its own input plan) references — same self-overwrite guard
        # as SnapshotSink.compact_snapshots.  Re-merging the same batch is
        # idempotent (updates replace identical rows).
        version_dir = os.path.join(
            state_root, f"v={epoch_id}-{uuid.uuid4().hex[:8]}"
        )
        merged.write.mode("overwrite").parquet(version_dir)
        tmp = ptr + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(version_dir)
        os.replace(tmp, ptr)  # atomic flip
        # retention: keep the new version + its predecessor (crash safety);
        # everything older is unreachable and deleted — bounds disk to 2x
        # state size instead of one full copy per epoch.
        keep = {version_dir, prev_dir}
        for name in os.listdir(state_root):
            full = os.path.join(state_root, name)
            if name.startswith("v=") and full not in keep:
                shutil.rmtree(full, ignore_errors=True)

    return apply


def start_cdc_apply(
    spark: SparkSession,
    *,
    input_dir: str,
    state_root: str,
    checkpoint_dir: str,
    schema,
    key: str,
    order_col: str = "ts",
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """AvailableNow drain: change-file stream -> foreachBatch merge into
    the materialized state table."""
    os.makedirs(state_root, exist_ok=True)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(_apply_batch(state_root, key, order_col))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
