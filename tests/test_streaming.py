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
