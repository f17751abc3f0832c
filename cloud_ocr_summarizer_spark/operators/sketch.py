"""Distinct-count sketching: deterministic KMV (k-minimum-values).

At 100 TB, exact COUNT(DISTINCT) shuffles every distinct key; sketches
cap the per-group state at k values.  HyperLogLog (Spark's
``approx_count_distinct``) is engine-internal and not bit-reproducible
across engines, so for the correctness gate we implement KMV with the
cross-engine md5/31-bit hash family (same family as
operators/dedup.md5_gram_hashes_col):

    estimate = (k - 1) / (h_(k) / M)

where h_(k) is the k-th smallest distinct hash normalized by
M = 2^31 - 1 (Beyer et al., "On synopses for distinct-value estimation
under multiset operations", SIGMOD'07).  Groups with < k distinct values
report the exact distinct count.

Physical shape (fully scalable, no collect_list):
  1 distinct-shuffle on (group, hash)  ->  per-group window rank  ->
  keep rank <= k  ->  1 tiny agg on (group).
The rank window partitions by group and the kept set is <= k rows per
group, so state is bounded everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_M = 2147483647  # 2^31 - 1, matches dedup._CK_M


def md5_hash31_col(value: Column) -> Column:
    """Cross-engine 31-bit hash: ('0x' || md5(v)[:14])::BIGINT % (2^31-1)."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(value.cast("string").cast("binary")), 1, 14), 16, 10
        ).cast("bigint"),
        F.lit(_M),
    )


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, *, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: (group, n_kept, kth_hash, est_distinct) where est_distinct is
    the KMV estimate rounded to 2 decimals (exact count when the group
    has fewer than k distinct values).  Deterministic: same input ->
    same sketch -> same estimate, on any partitioning and in DuckDB.
    """
    hashed = df.select(
        F.col(group_col).alias("grp"),
        md5_hash31_col(F.col(value_col)).alias("h"),
    ).dropDuplicates(["grp", "h"])
    w = Window.partitionBy("grp").orderBy("h")
    topk = hashed.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
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
                ).otherwise((k - 1) / (F.col("kth_hash") / F.lit(float(_M)))),
                2,
            ).alias("est_distinct"),
        )
    )
