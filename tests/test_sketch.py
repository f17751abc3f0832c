"""KMV distinct-count sketch: exact below k, bounded error above k."""

import pyspark.sql.functions as F

from cloud_ocr_summarizer_spark.operators.sketch import kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(
        F.lit("a").alias("g"), (F.col("id") % 10).alias("v")
    )
    row = kmv_distinct(df, "g", "v", k=64).collect()[0]
    assert row["n_kept"] == 10
    assert row["est_distinct"] == 10.0  # exact when distinct < k


def test_kmv_estimate_within_error_above_k(spark):
    # 5000 distinct values, k=64 -> standard error ~ 1/sqrt(k-2) ~ 12.7%
    df = spark.range(5000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    row = kmv_distinct(df, "g", "v", k=64).collect()[0]
    assert row["n_kept"] == 64
    assert abs(row["est_distinct"] - 5000) / 5000 < 0.35


def test_kmv_partition_invariant(spark):
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"), (F.col("id") % 500).alias("v")
    )
    a = sorted(map(tuple, kmv_distinct(df.repartition(13), "g", "v").collect()))
    b = sorted(map(tuple, kmv_distinct(df.coalesce(1), "g", "v").collect()))
    assert a == b
