"""Streaming incremental extraction: exactly-once across restarts."""

from cloud_ocr_summarizer_spark.datagen import interleaved_docs
from cloud_ocr_summarizer_spark.streaming.incremental import (
    start_incremental_extract,
)


def test_available_now_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = interleaved_docs(spark, 30, seed=42)
    batch1.write.mode("append").parquet(inp)

    q = start_incremental_extract(
        spark, input_dir=inp, output_dir=out, checkpoint_dir=ckpt
    )
    q.awaitTermination(120)
    got1 = spark.read.parquet(out)
    assert got1.count() == 30

    # second batch lands; restart drains ONLY the new files
    batch2 = interleaved_docs(spark, 45, seed=42).filter("doc_id >= 'doc_000000000030'")
    batch2.write.mode("append").parquet(inp)

    q2 = start_incremental_extract(
        spark, input_dir=inp, output_dir=out, checkpoint_dir=ckpt
    )
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    assert got2.count() == 45
    assert got2.select("doc_id").distinct().count() == 45  # exactly-once

def test_stateful_streaming_dedup(spark, tmp_path):
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from cloud_ocr_summarizer_spark.streaming.stateful import (
        streaming_first_occurrence,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("fingerprint", T.StringType())]
    )

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(inp)
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (
            streaming_first_occurrence(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(120)

    run_batch([("d1", "fA"), ("d2", "fA"), ("d3", "fB")])
    got1 = {(r["fingerprint"], r["doc_id"]) for r in spark.read.parquet(out).collect()}
    assert got1 == {("fA", "d1"), ("fB", "d3")}

    # second batch: fA repeats (suppressed by state), fC is new
    run_batch([("d4", "fA"), ("d5", "fC")])
    got2 = {(r["fingerprint"], r["doc_id"]) for r in spark.read.parquet(out).collect()}
    assert got2 == {("fA", "d1"), ("fB", "d3"), ("fC", "d5")}


def test_watermarked_windowed_counts(spark, tmp_path):
    """Tumbling event-time windows + watermark, append mode: finalized
    windows match the batch twin; late data beyond the watermark drops."""
    import datetime as dt

    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from cloud_ocr_summarizer_spark.streaming.windowed import (
        EVENT_SCHEMA,
        start_windowed_counts,
        windowed_counts,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "outw")
    ck = str(tmp_path / "ck")

    def ev(i, hour, minute, etype="click", value=1.0):
        return (i, dt.datetime(2026, 1, 1, hour, minute), 7, etype, value)

    def land(rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    # three files -> three micro-batches (maxFilesPerTrigger=1): the third
    # (03:00) pushes the watermark to 02:30, finalizing [00,01) and [01,02)
    land([ev(1, 0, 10), ev(2, 0, 20, "view", 2.0)])
    land([ev(3, 1, 10)])
    land([ev(4, 3, 0)])

    q = start_windowed_counts(
        spark, input_dir=inp, output_dir=out, checkpoint_dir=ck,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    got1 = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    batch_twin = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_counts(
            spark.createDataFrame(
                [ev(1, 0, 10), ev(2, 0, 20, "view", 2.0), ev(3, 1, 10)],
                EVENT_SCHEMA,
            )
        ).collect()
    }
    assert got1 == batch_twin  # finalized windows == batch semantics
    assert not any(h == 3 for h, _ in got1)  # [03,04) not finalized yet

    # phase 2: a LATE event for hour 0 (watermark already at 02:30 -> must
    # be dropped) plus a 05:00 event that finalizes [03,04)
    land([ev(5, 0, 40)])
    land([ev(6, 5, 0)])
    q2 = start_windowed_counts(
        spark, input_dir=inp, output_dir=out, checkpoint_dir=ck,
        max_files_per_trigger=1,
    )
    q2.awaitTermination(120)
    got2 = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert (3, "click") in got2  # [03,04) finalized by the 05:00 event
    # late hour-0 event dropped: hour-0 rows identical to phase 1
    assert got2[(0, "click")] == got1[(0, "click")]
    assert len([1 for h, _ in got2 if h == 0]) == 2  # no re-emission


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == the batch join on the
    same (on-time) input."""
    import datetime as dt

    from cloud_ocr_summarizer_spark.streaming.join import (
        click_purchase_join,
        start_click_purchase_join,
    )
    from cloud_ocr_summarizer_spark.streaming.windowed import EVENT_SCHEMA

    cdir = str(tmp_path / "clicks")
    pdir = str(tmp_path / "purch")
    out = str(tmp_path / "joined")
    ck = str(tmp_path / "ckj")

    def ev(i, user, hour, minute, etype, value=1.0):
        return (i, dt.datetime(2026, 1, 1, hour, minute), user, etype, value)

    clicks = [
        ev(1, 7, 10, 0, "click"),
        ev(2, 7, 10, 50, "click"),
        ev(3, 8, 10, 0, "click"),
        ev(4, 7, 8, 0, "click"),   # > 1h before the purchase: no match
    ]
    purchases = [
        ev(100, 7, 11, 0, "purchase", 42.0),
        ev(101, 9, 11, 0, "purchase", 5.0),  # user with no clicks
    ]
    cdf = spark.createDataFrame(clicks, EVENT_SCHEMA)
    pdf = spark.createDataFrame(purchases, EVENT_SCHEMA)
    cdf.coalesce(1).write.parquet(cdir)
    pdf.coalesce(1).write.parquet(pdir)

    q = start_click_purchase_join(
        spark, clicks_dir=cdir, purchases_dir=pdir,
        output_dir=out, checkpoint_dir=ck,
    )
    q.awaitTermination(120)

    got = sorted(
        (r["click_id"], r["purchase_id"])
        for r in spark.read.parquet(out).collect()
    )
    expected = sorted(
        (r["click_id"], r["purchase_id"])
        for r in click_purchase_join(cdf, pdf).collect()
    )
    assert got == expected
    assert got == [(1, 100), (2, 100)]  # in-window clicks of user 7 only


def test_streaming_cdc_apply(spark, tmp_path):
    """foreachBatch CDC upsert: the materialized table converges to the
    latest change per key across multiple drains, no duplicates."""
    import datetime as dt

    from pyspark.sql import types as T

    from cloud_ocr_summarizer_spark.streaming.cdc import (
        read_current,
        start_cdc_apply,
    )

    inp = str(tmp_path / "changes")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ckc")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )

    def land(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    def drain():
        q = start_cdc_apply(
            spark, input_dir=inp, state_root=state, checkpoint_dir=ck,
            schema=schema, key="k", order_col="ts",
        )
        q.awaitTermination(120)

    t = dt.datetime(2026, 1, 1)

    land([(1, "a", t), (2, "b", t)])
    drain()
    got = {r["k"]: r["v"] for r in read_current(spark, state).collect()}
    assert got == {1: "a", 2: "b"}

    # second drain: update k=1 (two changes in one batch, latest wins),
    # insert k=3; k=2 untouched
    land([(1, "a2", t.replace(hour=1)), (1, "a3", t.replace(hour=2)),
          (3, "c", t)])
    drain()
    cur = read_current(spark, state)
    got = {r["k"]: r["v"] for r in cur.collect()}
    assert got == {1: "a3", 2: "b", 3: "c"}
    assert cur.count() == 3  # no duplicate keys

    # re-drain with nothing new: state unchanged (idempotent)
    drain()
    assert {r["k"]: r["v"] for r in read_current(spark, state).collect()} == got


def test_streaming_curation_gates_match_batch(spark, tmp_path):
    """The stateless curation gates run under Structured Streaming
    (AvailableNow) and produce the same kept set + redacted text + split
    as the equivalent batch expressions; a second drain after more files
    land processes only the new files (exactly-once)."""
    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.functions.hashing import hash_split_col
    from cloud_ocr_summarizer_spark.operators.textstats import (
        quality_score_col,
        redact_pii,
        repetition_profile,
    )
    from cloud_ocr_summarizer_spark.streaming.incremental import (
        start_incremental_curation_gates,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source",
        F.concat(F.col("text"), F.lit(" ping me at u"),
                 F.col("doc_id").cast("string"), F.lit("@mail.org")).alias("text"),
    )
    in_dir = str(tmp_path / "in")
    docs.limit(300).write.mode("overwrite").parquet(in_dir)

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = start_incremental_curation_gates(
        spark, input_dir=in_dir, output_dir=out_dir, checkpoint_dir=ckpt
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]: (r["text"], r["split"])
        for r in spark.read.parquet(out_dir).collect()
    }

    # batch model: same gates via the batch operators
    first = docs.limit(300)
    gated = first.filter(quality_score_col(F.col("text")) >= 3000)
    rep = repetition_profile(first).filter("flagged").select("doc_id")
    kept = gated.join(rep, "doc_id", "left_anti")
    model = kept.join(
        redact_pii(kept).select("doc_id", "redacted"), "doc_id"
    ).withColumn("split", hash_split_col(F.col("doc_id")))
    want = {
        r["doc_id"]: (r["redacted"], r["split"]) for r in model.collect()
    }
    assert got == want
    assert all("@" not in t for t, _ in got.values())  # PII actually scrubbed

    # drain again with no new files: nothing re-emitted
    n_before = len(got)
    q2 = start_incremental_curation_gates(
        spark, input_dir=in_dir, output_dir=out_dir, checkpoint_dir=ckpt
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n_before


def test_stream_stream_left_outer_null_padding(spark, tmp_path):
    """LEFT OUTER stream-stream join: a purchase with no preceding click
    must eventually emit with NULL click columns — but only after the
    click-side watermark proves no match can still arrive.  Drain 1 reads
    the data (unmatched row held in state); drain 2, after newer clicks
    advance the watermark, flushes it null-padded.  Final output equals
    the batch left join on the on-time input."""
    import datetime as dt

    from cloud_ocr_summarizer_spark.streaming.join import (
        purchase_click_left_join,
        start_click_purchase_join,
    )
    from cloud_ocr_summarizer_spark.streaming.windowed import EVENT_SCHEMA

    cdir = str(tmp_path / "clicks")
    pdir = str(tmp_path / "purch")
    out = str(tmp_path / "joined")
    ck = str(tmp_path / "ckj")

    def ev(i, user, hour, minute, etype, value=1.0):
        return (i, dt.datetime(2026, 1, 1, hour, minute), user, etype, value)

    clicks = [
        ev(1, 7, 10, 0, "click"),
        ev(2, 7, 10, 50, "click"),
        ev(4, 7, 8, 0, "click"),  # > 1h before the purchase: no match
    ]
    purchases = [
        ev(100, 7, 11, 0, "purchase", 42.0),
        ev(101, 9, 11, 0, "purchase", 5.0),  # user with no clicks at all
    ]
    cdf = spark.createDataFrame(clicks, EVENT_SCHEMA)
    pdf = spark.createDataFrame(purchases, EVENT_SCHEMA)
    cdf.coalesce(1).write.parquet(cdir)
    pdf.coalesce(1).write.parquet(pdir)

    def drain():
        q = start_click_purchase_join(
            spark, clicks_dir=cdir, purchases_dir=pdir,
            output_dir=out, checkpoint_dir=ck, join_type="left_outer",
        )
        q.awaitTermination(120)

    drain()
    matched_now = {
        r["purchase_id"]
        for r in spark.read.parquet(out).collect()
        if r["click_id"] is not None
    }
    assert matched_now == {100}  # inner matches emit in drain 1

    # Newer events on BOTH sides push the GLOBAL watermark (Spark takes
    # the min across sources) past 11:00, so state for purchase 101 is
    # provably unmatched -> null-padded emit.  Two cycles: the watermark
    # computed at the END of one drain is what the NEXT drain evicts-and-
    # emits against — streaming watermarks always apply one micro-batch
    # later.  Flush users (1 clicks / 2 purchases) never join.
    for i, hour in enumerate((14, 15)):
        spark.createDataFrame(
            [ev(900 + i, 1, hour, 0, "click")], EVENT_SCHEMA
        ).coalesce(1).write.mode("append").parquet(cdir)
        spark.createDataFrame(
            [ev(950 + i, 2, hour, 0, "purchase")], EVENT_SCHEMA
        ).coalesce(1).write.mode("append").parquet(pdir)
        drain()

    got = sorted(
        (r["purchase_id"], r["click_id"])
        for r in spark.read.parquet(out).collect()
        if r["purchase_id"] in (100, 101)  # flush purchases may still sit in state
    )
    expected = sorted(
        (r["purchase_id"], r["click_id"])
        for r in purchase_click_left_join(cdf, pdf).collect()
    )
    assert got == expected
    assert (101, None) in got  # the null-padded unmatched purchase


def test_dedup_within_watermark_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: near-in-time duplicates suppressed,
    state EVICTED once the watermark passes (a far-later duplicate
    re-emits — the documented bounded-state trade vs
    streaming_first_occurrence), and sub-watermark late rows drop."""
    import datetime as dt

    from pyspark.sql import types as T

    from cloud_ocr_summarizer_spark.streaming.dedup import dedup_within_watermark

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    schema = T.StructType(
        [
            T.StructField("fingerprint", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (
            dedup_within_watermark(stream, delay="30 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(120)

    # fA duplicated within 5 min -> one row; fC at 12:00 pushes the
    # watermark to 11:30 at end of drain
    run_batch([("fA", t(10, 0)), ("fA", t(10, 5)), ("fB", t(10, 1)),
               ("fC", t(12, 0))])
    got1 = [r["fingerprint"] for r in spark.read.parquet(out).collect()]
    assert sorted(got1) == ["fA", "fB", "fC"]

    # drain 2: fA's state (10:00 + 30m < 11:30 watermark) was evicted ->
    # the 12:01 duplicate RE-EMITS; fB's 10:02 repeat is below the
    # watermark -> dropped entirely, never re-emitted
    run_batch([("fA", t(12, 1)), ("fB", t(10, 2))])
    got2 = sorted(r["fingerprint"] for r in spark.read.parquet(out).collect())
    assert got2 == ["fA", "fA", "fB", "fC"]


def test_available_now_incremental_extract_web(spark, tmp_path):
    """Composed web pipeline under AvailableNow: each drain runs the
    batch job via foreachBatch; the sink's anti-join keeps re-drains and
    batch retries exactly-once."""
    from cloud_ocr_summarizer_spark.sources.checkpoint import SnapshotSink
    from cloud_ocr_summarizer_spark.streaming.incremental import (
        start_incremental_extract_web,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    ckpt = str(tmp_path / "ckpt")

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.filter("doc_id < 60").select("doc_id", "source", "text").write.mode(
        "append"
    ).parquet(inp)

    q = start_incremental_extract_web(
        spark, input_dir=inp, output_root=out, checkpoint_dir=ckpt,
        lineage_root=lin,
    )
    q.awaitTermination(120)
    committed = SnapshotSink(out).read_committed(spark)
    assert committed.count() == 60

    # more documents land; the restart drains ONLY the new files
    docs.filter("doc_id >= 60 and doc_id < 100").select(
        "doc_id", "source", "text"
    ).write.mode("append").parquet(inp)
    q2 = start_incremental_extract_web(
        spark, input_dir=inp, output_root=out, checkpoint_dir=ckpt,
        lineage_root=lin,
    )
    q2.awaitTermination(120)
    committed = SnapshotSink(out).read_committed(spark)
    assert committed.count() == 100
    assert committed.select("doc_id").distinct().count() == 100

    # a third drain with nothing new is a no-op (no extra snapshots rows)
    q3 = start_incremental_extract_web(
        spark, input_dir=inp, output_root=out, checkpoint_dir=ckpt,
        lineage_root=lin,
    )
    q3.awaitTermination(120)
    assert SnapshotSink(out).read_committed(spark).count() == 100


def test_streaming_gates_full_repetition_variant(spark, tmp_path):
    """full_repetition=True additionally drops docs flagged by the
    line-level/n-gram family — same kept set as the batch
    repetition_profile_full flag on the gate survivors."""
    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.operators.textstats import (
        quality_score_col,
        repetition_flagged_col,
        repetition_profile_full,
    )
    from cloud_ocr_summarizer_spark.streaming.incremental import (
        start_incremental_curation_gates,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source",
        # plant a duplicated line on doc_id % 3 so the full gate fires
        F.when(
            F.pmod("doc_id", F.lit(3)) == 0,
            F.concat(F.col("text"), F.lit("\nrepeat me\nrepeat me")),
        ).otherwise(F.col("text")).alias("text"),
    ).limit(200)
    in_dir = str(tmp_path / "in")
    docs.write.mode("overwrite").parquet(in_dir)

    q = start_incremental_curation_gates(
        spark,
        input_dir=in_dir,
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        full_repetition=True,
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}

    base = docs.filter(quality_score_col(F.col("text")) >= 3000).filter(
        ~F.coalesce(repetition_flagged_col(F.col("text")), F.lit(False))
    )
    full_ok = repetition_profile_full(base).filter(~F.col("flagged_full")).select(
        "doc_id"
    )
    want = {r["doc_id"] for r in full_ok.collect()}
    assert got == want
    assert want  # survivors exist
    # the planted duplicate-line docs were genuinely dropped by the gate
    assert any(d % 3 == 0 for d in
               {r["doc_id"] for r in docs.select("doc_id").collect()} - want)


def test_available_now_incremental_warc_ingest(spark, tmp_path):
    """Crawl-shard ingestion under AvailableNow: the WARC round-trip
    pipeline (synthesize record -> envelope parse -> 200-filter -> DOM
    strip) runs per micro-batch through the same snapshot/anti-join
    contract.  404 documents never commit, so they stay pending across
    drains — idempotent and bounded (re-filtered each drain), the
    documented cost of a gate that drops rows before the sink."""
    from cloud_ocr_summarizer_spark.operators.warc import warc_main_text
    from cloud_ocr_summarizer_spark.sources.checkpoint import SnapshotSink
    from cloud_ocr_summarizer_spark.streaming.incremental import (
        start_incremental_extract_web,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.filter("doc_id < 60").select("doc_id", "source", "text").write.mode(
        "append"
    ).parquet(inp)
    kept_w1 = 60 - len([i for i in range(60) if i % 17 == 0])

    q = start_incremental_extract_web(
        spark, input_dir=inp, output_root=out, checkpoint_dir=ckpt,
        pipeline=warc_main_text,
    )
    q.awaitTermination(120)
    committed = SnapshotSink(out).read_committed(spark)
    assert committed.count() == kept_w1
    assert set(committed.columns) >= {"doc_id", "target_uri", "main_text"}

    docs.filter("doc_id >= 60 and doc_id < 100").select(
        "doc_id", "source", "text"
    ).write.mode("append").parquet(inp)
    kept_all = 100 - len([i for i in range(100) if i % 17 == 0])
    q2 = start_incremental_extract_web(
        spark, input_dir=inp, output_root=out, checkpoint_dir=ckpt,
        pipeline=warc_main_text,
    )
    q2.awaitTermination(120)
    committed = SnapshotSink(out).read_committed(spark)
    assert committed.count() == kept_all
    assert committed.select("doc_id").distinct().count() == kept_all


def test_available_now_incremental_sitemap_ingest(spark, tmp_path):
    """Sitemap shards under AvailableNow: each drain parses only the
    newly-landed shard files (stateless map — no foreachBatch, no
    state store, exactly-once via source offsets + sink commit log);
    a drain with nothing new appends nothing."""
    from cloud_ocr_summarizer_spark.operators.sitemap import (
        derive_sitemap_xml_from_documents,
    )
    from cloud_ocr_summarizer_spark.streaming.incremental import (
        start_incremental_sitemap_ingest,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def shards(lo, hi):
        return derive_sitemap_xml_from_documents(
            docs.filter(f"doc_id >= {lo} and doc_id < {hi}"), max_urls=3
        ).select("host", "shard_id", "sitemap_xml")

    shards(0, 60).write.mode("append").parquet(inp)
    q = start_incremental_sitemap_ingest(
        spark, input_dir=inp, output_dir=out, checkpoint_dir=ckpt
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 60  # one entry per doc, across shards
    assert set(got.columns) == {
        "host", "shard_id", "pos", "loc", "lastmod", "priority_milli"
    }

    # wave 2: only the new shard files are parsed on the next drain
    shards(60, 100).write.mode("append").parquet(inp)
    q2 = start_incremental_sitemap_ingest(
        spark, input_dir=inp, output_dir=out, checkpoint_dir=ckpt
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 100

    # no-op drain: nothing new landed, nothing is appended
    q3 = start_incremental_sitemap_ingest(
        spark, input_dir=inp, output_dir=out, checkpoint_dir=ckpt
    )
    q3.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 100
    assert got.select("loc").distinct().count() == 100


def test_available_now_incremental_feed_ingest(spark, tmp_path):
    """Feed files under AvailableNow: each drain parses only the
    newly-landed feeds (stateless map, exactly-once via source offsets
    + sink commit log); batch and streaming parses agree row-for-row."""
    from cloud_ocr_summarizer_spark.operators.feeds import (
        derive_feeds_from_documents,
        parse_feed_entries,
    )
    from cloud_ocr_summarizer_spark.streaming.incremental import (
        start_incremental_feed_ingest,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def feeds(lo, hi):
        return derive_feeds_from_documents(
            docs.filter(f"doc_id >= {lo} and doc_id < {hi}")
        ).select("host", "feed_xml")

    feeds(0, 60).write.mode("append").parquet(inp)
    q = start_incremental_feed_ingest(
        spark, input_dir=inp, output_dir=out, checkpoint_dir=ckpt
    )
    q.awaitTermination(120)
    wave1 = spark.read.parquet(out)
    batch1 = parse_feed_entries(feeds(0, 60))
    assert sorted(map(tuple, wave1.collect())) == sorted(
        map(tuple, batch1.collect())
    )

    # wave 2: only the new feed files are parsed on the next drain
    feeds(60, 100).write.mode("append").parquet(inp)
    q2 = start_incremental_feed_ingest(
        spark, input_dir=inp, output_dir=out, checkpoint_dir=ckpt
    )
    q2.awaitTermination(120)
    n_both = spark.read.parquet(out).count()
    assert n_both == batch1.count() + parse_feed_entries(feeds(60, 100)).count()

    # no-op drain appends nothing
    q3 = start_incremental_feed_ingest(
        spark, input_dir=inp, output_dir=out, checkpoint_dir=ckpt
    )
    q3.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_both
