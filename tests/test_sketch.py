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


def test_histogram_quantiles_within_one_bin_of_exact(spark):
    """Sketch accuracy contract: the estimate is the LOWER EDGE of the
    bin holding the ceil(q*n)-th smallest value — so it is bounded by
    that order statistic from above and by one bin width from below.
    (Interpolated percentile() is a different convention whose distance
    from any order statistic is unbounded in a sparse tail — compare
    against the statistic the sketch actually targets.)"""
    import math

    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.operators.sketch import histogram_quantiles

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_bins = 1024
    lo, hi = events.agg(F.min("value"), F.max("value")).first()
    bin_w = (hi - lo) / n_bins

    est = {
        r["event_type"]: r
        for r in histogram_quantiles(events, n_bins=n_bins).collect()
    }
    vals = {
        r["event_type"]: r["vs"]
        for r in events.groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("vs"))
        .collect()
    }
    assert est.keys() == vals.keys() and len(est) >= 2
    for et, vs in vals.items():
        n = len(vs)
        for q in (0.5, 0.9, 0.99):
            stat = vs[math.ceil(q * n) - 1]
            e = est[et][f"p{round(q * 100)}_est"]
            assert stat - bin_w <= e <= stat + 1e-4, (et, q, e, stat)


def test_histogram_quantiles_empty_and_constant(spark):
    """Empty input -> empty output; a constant column (zero span) must
    not divide by zero and reports the constant for every quantile."""
    from pyspark.sql import types as T

    from cloud_ocr_summarizer_spark.operators.sketch import histogram_quantiles

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    assert histogram_quantiles(spark.createDataFrame([], schema)).count() == 0

    const = spark.createDataFrame([("a", 5.0)] * 7 + [("b", 5.0)], schema)
    rows = {r["event_type"]: r for r in histogram_quantiles(const).collect()}
    assert rows["a"]["n"] == 7 and rows["b"]["n"] == 1
    for r in rows.values():
        assert r["p50_est"] == r["p90_est"] == r["p99_est"] == 5.0


def test_count_min_never_underestimates_and_is_tight_when_sparse(spark):
    """CMS invariants: every point estimate >= the true count, and with
    width >> distinct values the estimates are exact."""
    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.operators.sketch import (
        cms_estimate,
        count_min_sketch,
    )

    rows = [(f"u{i % 7}",) for i in range(100)] + [("heavy",)] * 40
    df = spark.createDataFrame(rows, "user_id string")
    true = {
        r["user_id"]: r["c"]
        for r in df.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    sketch = count_min_sketch(df, value_col="user_id", depth=4, width=512)
    probes = df.select("user_id").distinct()
    est = {
        r["user_id"]: r["estimate"]
        for r in cms_estimate(
            sketch, probes, value_col="user_id", depth=4, width=512
        ).collect()
    }
    assert set(est) == set(true)
    assert all(est[k] >= v for k, v in true.items())
    # 8 distinct values in 4x512 counters: collisions vanish -> exact
    assert est == true
    # an unseen value estimates 0 (all its counters empty) or tiny
    ghost = spark.createDataFrame([("never-seen",)], "user_id string")
    g = cms_estimate(sketch, ghost, value_col="user_id", depth=4, width=512)
    assert g.collect()[0]["estimate"] == 0


def test_hll_registers_match_python_and_estimate_is_close(spark):
    """Register table equals a pure-Python HLL over the same md5/31-bit
    family, and the estimate lands within 15% of the true distinct
    count at b=6 (theoretical rse ~ 1.04/sqrt(64) = 13%)."""
    import hashlib

    from cloud_ocr_summarizer_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    n_distinct = 5000
    rows = [(f"user-{i % n_distinct}",) for i in range(20000)]
    df = spark.createDataFrame(rows, "user_id string")
    got = {
        r["register"]: r["max_rho"]
        for r in hll_registers(df, value_col="user_id", b=6).collect()
    }

    want: dict[int, int] = {}
    for i in range(n_distinct):
        h = int(hashlib.md5(f"user-{i}".encode()).hexdigest()[:14], 16) % 2147483647
        reg, w = h % 64, h // 64
        rho = 25 - w.bit_length() + 1 if w > 0 else 26
        want[reg] = max(want.get(reg, 0), rho)
    assert got == want

    est = hll_estimate(sorted(got.items()), b=6)
    assert abs(est - n_distinct) / n_distinct < 0.15, est


def test_sketches_exclude_null_values(spark):
    """NULLs must not leak into either sketch: CMS cells with NULL cols
    are unjoinable (estimates silently lose mass), and a NULL register
    would corrupt hll_estimate's zero-register count."""
    from cloud_ocr_summarizer_spark.operators.sketch import (
        count_min_sketch,
        hll_registers,
    )

    rows = [("a",), (None,), ("a",), (None,), ("b",)]
    df = spark.createDataFrame(rows, "user_id string")
    cms = count_min_sketch(df, value_col="user_id", depth=2, width=16).collect()
    assert all(r["col"] is not None for r in cms)
    assert sum(r["count"] for r in cms) == 3 * 2  # 3 non-null rows x depth
    regs = hll_registers(df, value_col="user_id", b=4).collect()
    assert all(r["register"] is not None for r in regs)
