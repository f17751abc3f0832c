#!/usr/bin/env python
"""Tiered throughput for cross-document passage dedup
(dedup.dedup_cross_doc_passages).

The bench input plants real duplication: every doc with doc_id % 4 == 0
is replaced by an echo of its doc_id-minus-one neighbor's text, so ~25%
of documents lose all their chunks to a different document, on top of
whatever natural chunk overlap the generator produces.  Input doc count
(pre-planting size) is the throughput denominator.

Same cached corpora/protocol as the other tier benches; interleaved
reps are unnecessary here (single operator, no A/B).  Writes
BENCH/crossdoc.json and appends a BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_html_layout import build_corpus  # noqa: E402

TIERS = [120_000, 1_000_000, 4_000_000]


def main() -> int:
    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.operators.dedup import (
        dedup_cross_doc_passages,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-crossdoc", cores=32)

    def timed(make_df) -> float:
        def run() -> float:
            t0 = time.monotonic()
            make_df().write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        run()  # warm-up
        return min(run() for _ in range(3))

    tiers = []
    for n in TIERS:
        docs = spark.read.parquet(build_corpus(spark, n)).select("doc_id", "text")
        neighbors = docs.select(
            (F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("_nt")
        )
        planted = (
            docs.join(neighbors, "doc_id", "left")
            .select(
                "doc_id",
                F.when(
                    (F.pmod(F.col("doc_id"), F.lit(4)) == 0)
                    & F.col("_nt").isNotNull(),
                    F.col("_nt"),
                )
                .otherwise(F.col("text"))
                .alias("text"),
            )
            .persist()
        )
        planted.count()  # materialize so the join isn't in the timed path
        sec = timed(lambda: dedup_cross_doc_passages(planted))
        removed = (
            dedup_cross_doc_passages(planted)
            .agg(F.sum("n_removed").alias("r"), F.sum("n_chunks").alias("c"))
            .collect()[0]
        )
        planted.unpersist()
        row = {
            "n_docs": n,
            "sec": round(sec, 3),
            "docs_per_sec": round(n / sec, 1),
            "chunks": int(removed["c"]),
            "chunks_removed": int(removed["r"]),
        }
        tiers.append(row)
        print(json.dumps(row))

    with open(os.path.join(REPO, "BENCH", "crossdoc.json"), "w", encoding="utf-8") as f:
        json.dump({"tiers": tiers}, f)

    lines = [
        "", "## Cross-document passage dedup at tiers", "",
        "dedup_cross_doc_passages on the seeded corpus with ~25% of docs",
        "replaced by a neighbor's text (the gate does real work);",
        "local[32], seed=42, best-of-3 warm:", "",
        "| docs | sec | docs/s | chunks | removed |",
        "|---|---|---|---|---|",
    ]
    for t in tiers:
        lines.append(
            "| {n_docs} | {sec} | {docs_per_sec} | {chunks} | {chunks_removed} |".format(**t)
        )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
