"""Child job for the U4 failure-injection test (run in its own process).

The shared pytest session runs plain ``local[N]`` (no task retries), so
this job builds its own ``local[4,2]`` session — 4 threads, up to 2
attempts per task — and injects a TRANSIENT failure: every task's FIRST
attempt of the flaky mapInPandas stage raises, the retry succeeds.

This is the Spark-native translation of the reference's retry/backoff
loop (src/generative/aws/claude.py:124-176): transient per-item failures
are absorbed by task retries, and exactly-once output is guaranteed by
the write committer + SnapshotSink's manifest commit, not by
application-level retry bookkeeping.

Prints one RESULT line the parent test parses:
    RESULT expected=<n> committed=<n> distinct_docs=<n> pending=<n>
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(out_root: str) -> int:
    from pyspark import TaskContext
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4,2]")
        .appName("u4-failure-injection")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from cloud_ocr_summarizer_spark.datagen import interleaved_docs
    from cloud_ocr_summarizer_spark.operators.extract import extract_spans
    from cloud_ocr_summarizer_spark.sources.checkpoint import (
        SnapshotSink,
        pending_docs,
    )

    docs = interleaved_docs(spark, 40, seed=31).repartition(4).persist()
    # doc-level output (one row per doc, like the flagship sink): a doc
    # with zero extracted spans still lands in the output, so the resume
    # filter can prove completeness
    rows = extract_spans(docs, with_stats=False)
    expected = rows.count()  # clean run, no injection

    def flaky(batches):
        tc = TaskContext.get()
        if tc.attemptNumber() == 0:
            raise RuntimeError(
                f"injected transient failure partition={tc.partitionId()}"
            )
        yield from batches

    flaky_rows = rows.mapInPandas(flaky, schema=rows.schema)
    sink = SnapshotSink(out_root)
    sink.append(flaky_rows, run_id="u4-injection")

    committed = sink.read_committed(spark)
    n = committed.count()
    d = committed.select("doc_id").distinct().count()
    pending = pending_docs(docs, sink, spark).count()
    print(f"RESULT expected={expected} committed={n} distinct_docs={d} pending={pending}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1]))
