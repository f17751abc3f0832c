"""Bucketed co-located joins: pre-bucketing both sides on the join key
removes the join shuffle entirely — the 100 TB strategy for repeated
fact-fact joins (SURVEY.md §4.3; bucket counts must match)."""

import pyspark.sql.functions as F


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    n_buckets = 8
    orders = spark.range(1000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).cast("double").alias("o_total"),
    )
    items = spark.range(3000).select(
        (F.col("id") % 1000).alias("l_orderkey"),
        (F.col("id") % 13).cast("double").alias("l_price"),
    )
    (
        orders.write.mode("overwrite")
        .option("path", str(tmp_path / "orders_b"))
        .bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    (
        items.write.mode("overwrite")
        .option("path", str(tmp_path / "items_b"))
        .bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("items_bucketed")
    )
    try:
        a = spark.table("orders_bucketed")
        b = spark.table("items_bucketed")
        # disable broadcast so the join would otherwise shuffle both sides
        joined = (
            a.hint("merge")
            .join(b, a.o_orderkey == b.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.sum("l_price").alias("rev"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either bucketed side: the only
        # allowed Exchange is the final groupBy partial-agg exchange, which
        # bucketing also removes (grouping key == bucket key)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan.split("SortMergeJoin")[1], plan
        # correctness unchanged vs the unbucketed plan
        expected = (
            orders.join(items, orders.o_orderkey == items.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.sum("l_price").alias("rev"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expected.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS items_bucketed")


def test_write_clustered_files_have_disjoint_key_ranges(spark, tmp_path):
    """Data-skipping contract: every output file covers a tight,
    non-overlapping key interval (verified from the parquet footers a
    reader's pruning would actually use)."""
    import glob

    import pyarrow.parquet as pq

    from cloud_ocr_summarizer_spark.sources.layout import write_clustered

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "clustered")
    write_clustered(events, out, by="user_id", n_files=8)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "user_id"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2  # actually split across files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint intervals -> point lookup prunes to 1 file


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partition layout + a partition-key filter must prune at
    PLANNING time: the scan's PartitionFilters carries the predicate and
    only the matching partition's files are read (data skipping that at
    100 TB turns a full scan into one directory)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "events_by_type")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.partitionBy("event_type").mode("overwrite").parquet(path)

    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    start = plan.index("PartitionFilters")
    pf = plan[start : plan.index("]", start) + 1]
    assert "event_type" in pf  # predicate reached the partition pruner

    # physical evidence: the scan reads only the one partition's files
    n_types = events.select("event_type").distinct().count()
    sel = df.select(F.input_file_name()).distinct().collect()
    assert all("event_type=click" in r[0] for r in sel)
    total = spark.read.parquet(path).select(F.input_file_name()).distinct().count()
    assert len(sel) < total and n_types > 1


def test_write_zordered_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order contract: a range predicate on the SECOND key alone prunes
    files (single-key clustering cannot — every file spans that key's
    full domain).  Verified from the parquet footers, the stats a
    reader's pruning actually uses."""
    import glob

    import pyarrow.parquet as pq

    from cloud_ocr_summarizer_spark.sources.layout import (
        write_clustered,
        write_zordered,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    single = str(tmp_path / "single")
    zpath = str(tmp_path / "zorder")
    write_clustered(events, single, by="user_id", n_files=16)
    write_zordered(events, zpath, by=("user_id", "event_id"), n_files=16)

    def file_ranges(path, col):
        out = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                c = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                mins.append(c.statistics.min)
                maxs.append(c.statistics.max)
            if mins:
                out.append((min(mins), max(maxs)))
        return out

    lo, hi = events.selectExpr(
        "min(event_id)", "max(event_id)"
    ).first()
    # query: bottom ~20% of event_id, no user_id predicate
    q_hi = lo + (hi - lo) // 5

    def touched(path):
        rs = file_ranges(path, "event_id")
        assert len(rs) >= 8
        return sum(1 for (mn, mx) in rs if mn <= q_hi and mx >= lo), len(rs)

    t_single, n_single = touched(single)
    t_z, n_z = touched(zpath)
    assert t_single == n_single  # single-key layout: zero second-dim pruning
    assert t_z <= n_z // 2  # z-order: the same predicate skips >= half

    # layout must not change content
    got = spark.read.parquet(zpath)
    assert got.count() == events.count()
    assert sorted(got.columns) == sorted(events.columns)


def test_zorder_key_matches_python_interleave(spark):
    """The JVM bit-expression Morton key equals a reference Python
    interleave on 10k seeded random pairs, and is bijective on them."""
    import random

    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.sources.layout import zorder_key_col

    rng = random.Random(42)
    pairs = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(10_000)]

    def ref(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pairs, "x int, y int").select(
        "x", "y", zorder_key_col(F.col("x"), F.col("y")).alias("z")
    )
    rows = df.collect()
    assert all(r["z"] == ref(r["x"], r["y"]) for r in rows)
    assert len({r["z"] for r in rows}) == len({(x, y) for x, y in pairs})


def test_write_zordered_empty_input(spark, tmp_path):
    from pyspark.sql import types as T

    from cloud_ocr_summarizer_spark.sources.layout import write_zordered

    schema = T.StructType(
        [T.StructField("x", T.LongType()), T.StructField("y", T.LongType())]
    )
    out = str(tmp_path / "z_empty")
    write_zordered(
        spark.createDataFrame([], schema), out, by=("x", "y"), n_files=4
    )
    assert spark.read.parquet(out).count() == 0
