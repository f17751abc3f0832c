"""Output layout for data skipping at read time.

At 100 TB the dominant cost of most downstream queries is the SCAN;
parquet row-group min/max statistics prune it, but only if values are
clustered so each file covers a narrow key range.  ``write_clustered``
range-partitions on the key and sorts within partitions, so every file
holds one tight, non-overlapping key interval — a point or range lookup
then touches O(1) files instead of all of them (the poor man's
Z-order/liquid clustering for a single key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    *,
    by: str = "doc_id",
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on ``by``: repartitionByRange gives each
    output file a disjoint key interval; sortWithinPartitions makes the
    row groups inside each file monotonic, so footer min/max stats are
    tight at BOTH granularities.

    One range shuffle (sampled boundaries); n_files defaults to the
    session's parallelism — size it to ~1 GB files at scale.
    """
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, by)
        .sortWithinPartitions(by)
        .write.mode(mode)
        .parquet(path)
    )
