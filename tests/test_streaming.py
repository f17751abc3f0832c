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