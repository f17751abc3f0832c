#!/usr/bin/env python
"""Corpus-curation throughput at bench scale (120k documents).

The driver's `documents` table caps at 5k rows (sf0.1) — too small to
measure the dedup path.  This tool assembles a 120k-doc text corpus from
the deterministic interleaved-docs table (array_join of each doc's text
spans, row-local) and times:

  * minhash  — MinHash+LSH near-dup pair mining alone
  * curate   — the full composed pipeline (exact dedup -> MinHash ->
               quality gate -> hash split)

Writes BENCH/curation.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from cloud_ocr_summarizer_spark.datagen import interleaved_docs  # noqa: E402
from cloud_ocr_summarizer_spark.operators.dedup import minhash_lsh_pairs  # noqa: E402
from cloud_ocr_summarizer_spark.plans.curate import curate_documents  # noqa: E402
from cloud_ocr_summarizer_spark.session import get_spark  # noqa: E402

N_DOCS = 120_000


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def build_corpus(spark, base: str) -> str:
    path = os.path.join(base, f"curation_corpus_{N_DOCS}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = interleaved_docs(spark, N_DOCS, seed=42)
        text = F.array_join(
            F.filter(
                F.transform(F.col("spans"), lambda s: s["text"]),
                lambda t: t.isNotNull(),
            ),
            " ",
        )
        docs.select("doc_id", text.alias("text")).write.mode("overwrite").parquet(path)
    return path


def main() -> int:
    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")
    os.makedirs(cache, exist_ok=True)
    spark = get_spark(app_name="bench-curation")
    corpus = spark.read.parquet(build_corpus(spark, cache))
    par = spark.sparkContext.defaultParallelism

    def run_minhash():
        _force(minhash_lsh_pairs(corpus, n=3, num_hashes=32, bands=8,
                                 threshold=0.8, parallelism=par))

    def run_curate():
        _force(curate_documents(corpus, min_quality=2000, parallelism=par))

    timings = {}
    for name, fn in (("minhash_sec", run_minhash), ("curate_sec", run_curate)):
        fn()  # warm-up
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)

    out = {
        "n_docs": N_DOCS,
        **timings,
        "minhash_docs_per_sec": round(N_DOCS / timings["minhash_sec"], 1),
        "curate_docs_per_sec": round(N_DOCS / timings["curate_sec"], 1),
    }
    with open(os.path.join(REPO, "BENCH", "curation.json"), "w", encoding="utf-8") as f:
        json.dump(out, f)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
