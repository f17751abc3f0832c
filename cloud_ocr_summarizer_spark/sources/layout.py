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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def zorder_key_col(x: Column, y: Column, *, bits: int = 16) -> Column:
    """Morton/Z-value of two non-negative ints: interleave the low
    ``bits`` of each (x in even positions, y in odd).  Pure JVM bit
    expressions — whole-stage-codegen'd, no Python anywhere."""
    x = x.cast("long")
    y = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    by: tuple[str, str],
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ordered on TWO keys, so range predicates on EITHER
    (or both) prune files.  Single-key clustering makes the second key
    uniform across every file — a filter on it prunes nothing; the
    Z-curve keeps both dimensions locally coherent, so each file covers a
    tight rectangle and a box query touches ~(selectivity_x x
    selectivity_y) of the files.

    Each key is first scaled to [0, 2^bits) by a min/max linear map (one
    tiny agg, broadcast back — fine for roughly-uniform keys; for skewed
    keys substitute per-column quantile bucketing before the interleave,
    which is what Delta's OPTIMIZE ZORDER effectively does via sampled
    range ids).  Then one range shuffle on the z-value, sort within
    partitions, write.  The z column is dropped from the output —
    layout-only, schema unchanged.
    """
    cx, cy = by
    span = (1 << bits) - 1
    stats = df.agg(
        F.min(cx).alias("_minx"),
        F.max(cx).alias("_maxx"),
        F.min(cy).alias("_miny"),
        F.max(cy).alias("_maxy"),
    )
    scaled = df.crossJoin(F.broadcast(stats))
    sx = F.floor(
        (F.col(cx) - F.col("_minx"))
        * span
        / F.greatest(F.col("_maxx") - F.col("_minx"), F.lit(1))
    )
    sy = F.floor(
        (F.col(cy) - F.col("_miny"))
        * span
        / F.greatest(F.col("_maxy") - F.col("_miny"), F.lit(1))
    )
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        scaled.withColumn("_z", zorder_key_col(sx, sy, bits=bits))
        .drop("_minx", "_maxx", "_miny", "_maxy")
        .repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
