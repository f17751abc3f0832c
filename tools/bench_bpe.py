#!/usr/bin/env python
"""Tiered throughput for distributed BPE merge learning
(operators/bpe.train_bpe_merges, 6 merges).

The interesting scale property: the corpus-sized work is ONE wordcount;
every merge round runs on the DISTINCT-word table, whose size grows far
slower than the corpus — so per-doc training throughput should RISE
steeply with corpus size.  The vocab row count per tier is printed to
make that mechanism visible.

The seeded generator's lexicon is only ~27 words, which would make the
merge rounds toy-sized; the bench corpus therefore diversifies each
word with a deterministic per-(word, doc) suffix (word-hash % 4096),
yielding a realistic ~10^5-word vocabulary whose distinct-word table
the merge rounds genuinely have to process.

Writes BENCH/bpe.json and appends a BASELINE.md section.
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
    from cloud_ocr_summarizer_spark.operators.bpe import (
        train_bpe_merges,
        word_frequencies,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-bpe", cores=32)

    from pyspark.sql import functions as F

    def diversified(n: int) -> str:
        cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")
        path = os.path.join(cache, f"bpe_corpus_{n}.parquet")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            docs = spark.read.parquet(build_corpus(spark, n))
            text2 = F.array_join(
                F.transform(
                    F.filter(
                        F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"),
                        lambda w: w != F.lit(""),
                    ),
                    lambda w: F.concat(
                        w,
                        F.lit("-"),
                        F.pmod(F.xxhash64(w, F.col("doc_id")), F.lit(4096)).cast(
                            "string"
                        ),
                    ),
                ),
                " ",
            )
            docs.select("doc_id", text2.alias("text")).write.mode(
                "overwrite"
            ).parquet(path)
        return path

    tiers = []
    for n in TIERS:
        docs = spark.read.parquet(diversified(n)).select("doc_id", "text")
        n_vocab = word_frequencies(docs).count()

        def run() -> float:
            t0 = time.monotonic()
            merges = train_bpe_merges(docs, n_merges=6)
            assert len(merges) == 6
            return time.monotonic() - t0

        run()  # warm-up
        sec = min(run() for _ in range(2))
        row = {
            "n_docs": n,
            "n_vocab": int(n_vocab),
            "sec": round(sec, 3),
            "docs_per_sec": round(n / sec, 1),
        }
        tiers.append(row)
        print(json.dumps(row))

    with open(os.path.join(REPO, "BENCH", "bpe.json"), "w", encoding="utf-8") as f:
        json.dump({"tiers": tiers, "n_merges": 6}, f)

    lines = [
        "## BPE merge learning at tiers (6 merges)", "",
        "train_bpe_merges: one corpus wordcount, then vocab-sized merge",
        "rounds; local[32], seed=42, best-of-2 warm:", "",
        "| docs | distinct words | sec | docs/s |",
        "|---|---|---|---|",
    ]
    for t in tiers:
        lines.append("| {n_docs} | {n_vocab} | {sec} | {docs_per_sec} |".format(**t))
    from tools.mdsection import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        '## BPE merge learning at tiers (6 merges)',
        "\n".join(lines) + "\n",
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
