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
SCALING_DOCS = 480_000

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from cloud_ocr_summarizer_spark.session import get_spark
from cloud_ocr_summarizer_spark.operators.dedup import dedup_cross_doc_passages

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark(app_name=f"crossdoc-scaling-{{cores}}", cores=cores)
docs = spark.read.parquet(path)

def run():
    t0 = time.monotonic()
    dedup_cross_doc_passages(docs).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0

run()  # warm-up
best = min(run() for _ in range(2))
print(json.dumps({{"cores": cores, "sec": round(best, 3),
                   "docs_per_sec": round(n_docs / best, 1)}}))
"""


def child(cores: int, n_docs: int, path: str) -> dict:
    import subprocess

    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO),
         str(cores), str(n_docs), path],
        capture_output=True, text=True, timeout=1800, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def planted_path(spark, n: int) -> str:
    """The tier corpus with ~25% of docs replaced by a neighbor's text,
    materialized once so children (and the tier timings) never pay the
    planting join."""
    from pyspark.sql import functions as F

    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")
    path = os.path.join(cache, f"crossdoc_planted_{n}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = spark.read.parquet(build_corpus(spark, n)).select("doc_id", "text")
        neighbors = docs.select(
            (F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("_nt")
        )
        (
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
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


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
        planted = spark.read.parquet(planted_path(spark, n))
        sec = timed(lambda: dedup_cross_doc_passages(planted))
        removed = (
            dedup_cross_doc_passages(planted)
            .agg(F.sum("n_removed").alias("r"), F.sum("n_chunks").alias("c"))
            .collect()[0]
        )
        row = {
            "n_docs": n,
            "sec": round(sec, 3),
            "docs_per_sec": round(n / sec, 1),
            "chunks": int(removed["c"]),
            "chunks_removed": int(removed["r"]),
        }
        tiers.append(row)
        print(json.dumps(row))

    # N -> 4N scaling on the SHUFFLE-bound regime (separate JVMs,
    # alternate levels, best-of-2 children per level — same protocol as
    # bench_scaling.py / bench_html_layout.py).  This is the third job
    # regime after JVM-expression-bound (flagship) and Python-worker-
    # bound (HTML strip / PDF parse): a job dominated by two hash-agg
    # exchanges + a join.
    spath = planted_path(spark, SCALING_DOCS)
    spark.stop()
    lows, highs = [], []
    for _ in range(2):
        lows.append(child(2, SCALING_DOCS, spath))
        highs.append(child(8, SCALING_DOCS, spath))
    low = min(lows, key=lambda r: r["sec"])
    high = min(highs, key=lambda r: r["sec"])
    eff = round((high["docs_per_sec"] / low["docs_per_sec"]) / 4.0, 3)
    scaling = {
        "n_docs": SCALING_DOCS, "localN": low, "local4N": high,
        "scaling_efficiency_N_to_4N": eff,
    }
    print(json.dumps(scaling))

    with open(os.path.join(REPO, "BENCH", "crossdoc.json"), "w", encoding="utf-8") as f:
        json.dump({"tiers": tiers, "scaling": scaling}, f)

    lines = [
        "## Cross-document passage dedup at tiers", "",
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
    lines += [
        "",
        "N->4N scaling on the shuffle-bound regime (local[2] vs local[8],",
        "separate JVMs, alternating, best-of-2 per level, {} docs):".format(
            SCALING_DOCS
        ),
        "{} -> {} docs/s, efficiency {}".format(
            low["docs_per_sec"], high["docs_per_sec"], eff
        ),
    ]
    from tools.mdsection import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        '## Cross-document passage dedup at tiers',
        "\n".join(lines) + "\n",
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
