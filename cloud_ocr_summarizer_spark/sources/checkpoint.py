"""Batch-incremental checkpoint/resume (SURVEY.md §2.10, §4.3(4)).

The reference's "resumability" is delete-after-processing + rerun
(vision_processor.py:89-91); at 10^12 docs that becomes: every committed
batch is a SNAPSHOT, and a restarted job processes only doc_ids absent
from committed output (left_anti).

On an Iceberg deployment the snapshot IS the table snapshot
(``df.writeTo(tbl).append()`` + snapshot id); this module provides the
jar-free stand-in used in the sandbox: an append-only parquet directory
per snapshot + a manifest JSON, with the SAME resume semantics.  The sink
API is what the flagship plan codes against, so swapping Iceberg in is a
one-class change.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


class SnapshotSink:
    """Append-only snapshotted parquet sink with a manifest.

    Layout:  <root>/manifest.json
             <root>/snap=<snapshot_id>/part-*.parquet
    A snapshot is visible iff it is listed in the manifest (commit point),
    so a job killed mid-write never exposes partial output — same
    visibility rule as an Iceberg snapshot commit.
    """

    def __init__(self, root: str) -> None:
        self.root = root
        self._manifest_path = os.path.join(root, "manifest.json")

    # -- manifest ----------------------------------------------------------
    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"snapshots": []}
        with open(self._manifest_path, encoding="utf-8") as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        return self._read_manifest()["snapshots"]

    # -- write/commit -------------------------------------------------------
    def append(self, df: DataFrame, *, run_id: str | None = None) -> int:
        """Write df as a new snapshot; returns the snapshot id.  The write
        lands fully before the manifest commit makes it visible."""
        snapshot_id = int(time.time() * 1000)
        path = os.path.join(self.root, f"snap={snapshot_id}")
        df.write.mode("overwrite").parquet(path)
        manifest = self._read_manifest()
        manifest["snapshots"].append(
            {
                "snapshot_id": snapshot_id,
                "run_id": run_id or uuid.uuid4().hex,
                "path": path,
                "committed_at": time.time(),
            }
        )
        os.makedirs(self.root, exist_ok=True)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path)  # atomic commit point
        return snapshot_id

    # -- read ----------------------------------------------------------------
    def read_committed(self, spark: SparkSession) -> DataFrame | None:
        """Union of all committed snapshots (None if nothing committed)."""
        snaps = self.snapshots()
        if not snaps:
            return None
        return spark.read.parquet(*[s["path"] for s in snaps])

    def read_since(self, spark: SparkSession, snapshot_id: int) -> DataFrame | None:
        """Incremental read: snapshots strictly after ``snapshot_id``.

        Compaction merges old snapshots into a base carrying the NEWEST
        merged id, so a cursor pointing INSIDE the merged range would
        re-receive rows it already consumed — that cursor is invalid and
        raises (manifest ``min_readable_id``).  Epoch cursors (<= 0)
        stay valid: a consumer that has read nothing gets every row
        exactly once regardless of compaction.
        """
        manifest = self._read_manifest()
        min_readable = manifest.get("min_readable_id")
        if min_readable is not None and 0 < snapshot_id < min_readable:
            raise ValueError(
                f"cursor {snapshot_id} predates the compacted base "
                f"{min_readable}: rows from merged snapshots would be "
                "re-delivered; restart from read_committed() or a cursor "
                ">= the base id"
            )
        snaps = [s for s in manifest["snapshots"] if s["snapshot_id"] > snapshot_id]
        if not snaps:
            return None
        return spark.read.parquet(*[s["path"] for s in snaps])


    # -- maintenance ---------------------------------------------------------
    def compact_snapshots(
        self, spark: SparkSession, *, keep_last: int = 1
    ) -> int | None:
        """Merge all but the last ``keep_last`` snapshots into one base
        snapshot (the Iceberg expire_snapshots / rewrite_data_files
        analogue, reference S9/O2 retention).

        Bounds manifest growth and the small-files problem at scale while
        preserving BOTH invariants: committed rows are unchanged, and the
        resume filter (pending_docs) sees the same doc set.  The manifest
        swap is the atomic commit point; old directories are deleted only
        after it lands, so a crash mid-compaction never loses data.
        Returns the new base snapshot id, or None if nothing to compact.
        """
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        manifest = self._read_manifest()
        snaps = manifest["snapshots"]
        to_merge, keep = snaps[:-keep_last], snaps[-keep_last:]
        if len(to_merge) < 2:
            # nothing to gain (0 or 1 old snapshot) — and merging a single
            # snapshot into itself would overwrite its own input files
            return None
        merged = spark.read.parquet(*[s["path"] for s in to_merge])
        # the base adopts the NEWEST merged id: cursors at/after it keep
        # working; cursors strictly inside the merged range are invalidated
        # (recorded as min_readable_id, enforced by read_since)
        base_id = to_merge[-1]["snapshot_id"]
        # unique output dir: never collides with any input (re-compaction
        # of an already-compacted base is safe)
        path = os.path.join(self.root, f"snap={base_id}-compacted-{uuid.uuid4().hex[:8]}")
        merged.write.mode("overwrite").parquet(path)
        manifest["snapshots"] = [
            {
                "snapshot_id": base_id,
                "run_id": "compaction",
                "path": path,
                "committed_at": time.time(),
            }
        ] + keep
        manifest["min_readable_id"] = max(base_id, manifest.get("min_readable_id", 0))
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path)  # atomic commit point
        for s in to_merge:
            if s["path"] != path:
                shutil.rmtree(s["path"], ignore_errors=True)
        return base_id


def pending_docs(
    input_df: DataFrame, sink: SnapshotSink, spark: SparkSession, key: str = "doc_id"
) -> DataFrame:
    """Docs not yet in committed output: the left_anti resume filter."""
    done = sink.read_committed(spark)
    if done is None:
        return input_df
    return input_df.join(done.select(key).distinct(), on=key, how="left_anti")
