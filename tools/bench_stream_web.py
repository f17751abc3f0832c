#!/usr/bin/env python
"""Streaming twin of the classified north-rule job at a real tier.

tests/test_streaming.py proves the AvailableNow + foreachBatch +
snapshot-anti-join contract at sf0.001 (100 docs); THIS tool drains
120k documents — a size where the exactly-once anti-join could actually
break — and asserts full row parity between the streamed output and the
batch pipeline on the same input, then lands a 5k-doc second wave to
prove the incremental path adds exactly the new documents.

Protocol (local[32], deterministic corpus, classified fused pipeline):
  wave 1: 120k docs land -> one AvailableNow drain (timed)
  parity: stream output == batch extract_web_documents_classified_fused
          (exceptAll both directions == 0 rows)
  wave 2: 5k new docs land -> second drain (timed); total rows 125k,
          all doc_ids distinct (no reprocessing, no duplicates)

Writes BENCH/stream_web.json + a BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_html_layout import build_corpus  # noqa: E402

N_DOCS = 120_000
N_WAVE2 = 5_000
ID_SHIFT = 50_000_000  # wave-2 ids, disjoint from every corpus id


def main() -> int:
    from cloud_ocr_summarizer_spark.plans.extract_web import (
        extract_web_documents_classified_fused,
    )
    from cloud_ocr_summarizer_spark.session import get_spark
    from cloud_ocr_summarizer_spark.sources.checkpoint import SnapshotSink
    from cloud_ocr_summarizer_spark.streaming.incremental import (
        start_incremental_extract_web,
    )

    spark = get_spark(app_name="bench-stream-web", cores=32)
    corpus = spark.read.parquet(build_corpus(spark, N_DOCS))

    base = "/tmp/spark_graft_stream_web"
    shutil.rmtree(base, ignore_errors=True)
    inp = os.path.join(base, "in")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    lin = os.path.join(base, "lineage")

    # wave 1 lands (outside the timed region — arrival isn't the job)
    corpus.select("doc_id", "text", "source").repartition(32).write.mode(
        "append"
    ).parquet(inp)

    def drain() -> float:
        t0 = time.monotonic()
        q = start_incremental_extract_web(
            spark,
            input_dir=inp,
            output_root=out,
            checkpoint_dir=ckpt,
            lineage_root=lin,
            pipeline=extract_web_documents_classified_fused,
        )
        q.awaitTermination()
        return time.monotonic() - t0

    wall1 = drain()
    committed = SnapshotSink(out).read_committed(spark)
    n1 = committed.count()

    batch = extract_web_documents_classified_fused(spark.read.parquet(inp))
    streamed = committed.select(*batch.columns)
    extra = streamed.exceptAll(batch).count()
    missing = batch.exceptAll(streamed).count()

    # wave 2: new documents land; the next drain must add exactly these
    corpus.limit(N_WAVE2).select(
        (F.col("doc_id") + ID_SHIFT).alias("doc_id"), "text", "source"
    ).write.mode("append").parquet(inp)
    wall2 = drain()
    after = SnapshotSink(out).read_committed(spark)
    n2 = after.count()
    n_distinct = after.select("doc_id").distinct().count()

    result = {
        "n_docs_wave1": N_DOCS,
        "n_docs_wave2": N_WAVE2,
        "wave1_wall_sec": round(wall1, 3),
        "wave1_docs_per_sec": round(N_DOCS / wall1, 1),
        "wave2_wall_sec": round(wall2, 3),
        "rows_after_wave1": n1,
        "rows_after_wave2": n2,
        "distinct_docs_after_wave2": n_distinct,
        "stream_minus_batch_rows": extra,
        "batch_minus_stream_rows": missing,
        "parity_ok": extra == 0 and missing == 0 and n1 == N_DOCS,
        "exactly_once_ok": n2 == N_DOCS + N_WAVE2 and n_distinct == n2,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH", "stream_web.json"), "w",
              encoding="utf-8") as f:
        json.dump(result, f)

    ok = result["parity_ok"] and result["exactly_once_ok"]
    lines = [
        "## Streaming twin of the classified job at 120k docs",
        "",
        "AvailableNow drain of the composed classified pipeline via",
        "foreachBatch + snapshot anti-join (start_incremental_extract_web),",
        "local[32]; parity = exceptAll against the batch plan on the same",
        "input, both directions:", "",
        "| measure | value |", "|---|---|",
        f"| wave 1 (120k docs) wall | {result['wave1_wall_sec']} s |",
        f"| wave 1 docs/s | {result['wave1_docs_per_sec']:,} |",
        f"| stream vs batch row diff | {extra} + {missing} |",
        f"| wave 2 (5k new docs) wall | {result['wave2_wall_sec']} s |",
        f"| rows after wave 2 | {n2} (distinct {n_distinct}) |",
        f"| parity + exactly-once | {'PASS' if ok else 'FAIL'} |",
        "",
    ]
    from tools.mdsection import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        '## Streaming twin of the classified job at 120k docs',
        "\n".join(lines),
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
