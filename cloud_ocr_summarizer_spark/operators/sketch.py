"""Distinct-count sketching: deterministic KMV (k-minimum-values).

At 100 TB, exact COUNT(DISTINCT) shuffles every distinct key; sketches
cap the per-group state at k values.  HyperLogLog (Spark's
``approx_count_distinct``) is engine-internal and not bit-reproducible
across engines, so for the correctness gate we implement KMV with the
cross-engine md5/31-bit hash family (functions/hashing.py):

    estimate = (k - 1) / (h_(k) / M)

where h_(k) is the k-th smallest distinct hash normalized by
M = 2^31 - 1 (Beyer et al., "On synopses for distinct-value estimation
under multiset operations", SIGMOD'07).  Groups with < k distinct values
report the exact distinct count.

Physical shape — two-level top-k so state is bounded EVERYWHERE:
  1. map-side prune (mapInPandas): each Arrow batch keeps only the k
     smallest distinct hashes per group it contains — output is
     <= k x groups x batches rows, no matter how many distinct values
     exist;
  2. merge: distinct + per-group rank window over the pruned rows (input
     already bounded, so the window partition is small by construction);
  3. one tiny agg per group.
Never a global O(distinct)-rows sort in a single task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from cloud_ocr_summarizer_spark.functions.hashing import M31, md5_hash31_col

__all__ = ["kmv_distinct", "md5_hash31_col"]

_M = M31  # backward-compatible alias


def _batch_prune(k: int):
    """Iterator[pdf(grp,h)] -> per-batch k smallest distinct h per grp."""

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            dedup = pdf.drop_duplicates()
            kept = (
                dedup.sort_values("h")
                .groupby("grp", sort=False, dropna=False)
                .head(k)
                .reset_index(drop=True)
            )
            yield kept

    return prune


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, *, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: (group, n_kept, kth_hash, est_distinct) where est_distinct is
    the KMV estimate rounded to 2 decimals (exact count when the group
    has fewer than k distinct values).  Deterministic: same input ->
    same sketch -> same estimate, on any partitioning and in DuckDB
    (per-batch pruning keeps a superset of each group's k global minima —
    pigeonhole — so the merged result is exactly the unpruned one).
    """
    grp_type = df.schema[group_col].dataType.simpleString()
    hashed = df.select(
        F.col(group_col).alias("grp"),
        md5_hash31_col(F.col(value_col)).alias("h"),
    ).filter(F.col("h").isNotNull())  # null values don't count as distinct
    pruned = hashed.mapInPandas(
        _batch_prune(k), schema=f"grp {grp_type}, h bigint"
    ).dropDuplicates(["grp", "h"])
    w = Window.partitionBy("grp").orderBy("h")
    topk = pruned.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    return (
        topk.groupBy("grp")
        .agg(
            F.count("*").alias("n_kept"),
            F.max("h").alias("kth_hash"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_kept",
            "kth_hash",
            F.round(
                F.when(
                    F.col("n_kept") < k, F.col("n_kept").cast("double")
                ).otherwise((k - 1) / (F.col("kth_hash") / F.lit(float(M31)))),
                2,
            ).alias("est_distinct"),
        )
    )
