#!/usr/bin/env python
"""Tiered throughput for the round-4 operator families:

* integer PageRank over the derived corpus link graph
  (operators/linkgraph.pagerank_over_documents, 5 iterations — the
  iterative shuffle regime: edges join ranks + groupBy dst per round)
* supervised BoW classification (operators/bow.classify_bow — train on
  the 80% hash split, score the held-out 20%; vocab-sized broadcast
  tables + one corpus explode)

Tiers at local[32] on the shared derived corpus; per-doc cost must not
RISE with corpus size (the 100-TB smell test).  Writes
BENCH/linkgraph_bow.json + a BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_html_layout import build_corpus  # noqa: E402

TIERS = [120_000, 1_000_000, 4_000_000]
LANGS = ("en", "de", "es", "fr", "zh")


def main() -> int:
    from cloud_ocr_summarizer_spark.operators.bow import classify_bow
    from cloud_ocr_summarizer_spark.operators.linkgraph import (
        pagerank_over_documents,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-linkgraph-bow", cores=32)

    def timed(make_df) -> float:
        def run() -> float:
            t0 = time.monotonic()
            make_df().write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        run()  # warm-up
        return min(run() for _ in range(2))

    tiers_out = []
    for n in TIERS:
        docs = spark.read.parquet(build_corpus(spark, n))
        # the shared corpus has no lang column; derive a deterministic
        # 5-way label so the classifier's shape matches the driver query
        labeled = docs.withColumn(
            "lang",
            F.element_at(
                F.array(*[F.lit(x) for x in LANGS]),
                (F.pmod(F.xxhash64("doc_id", F.lit("lang")), F.lit(5)) + 1).cast(
                    "int"
                ),
            ),
        )
        pr = timed(lambda: pagerank_over_documents(docs, n_iter=5))
        bw = timed(lambda: classify_bow(labeled))
        tiers_out.append(
            {
                "n_docs": n,
                "pagerank_sec": round(pr, 3),
                "pagerank_docs_per_sec": round(n / pr, 1),
                "bow_sec": round(bw, 3),
                "bow_docs_per_sec": round(n / bw, 1),
            }
        )
        print(json.dumps(tiers_out[-1]), flush=True)

    out = {"tiers": tiers_out, "pagerank_iters": 5, "langs": len(LANGS)}
    with open(os.path.join(REPO, "BENCH", "linkgraph_bow.json"), "w",
              encoding="utf-8") as f:
        json.dump(out, f)

    lines = [
        "## Tiered: link-graph PageRank + BoW classifier (round 4)",
        "",
        "local[32], warm best-of-2, shared derived corpus; PageRank runs",
        "5 integer-micro iterations over the synthesized ~2x-corpus edge",
        "set; BoW trains on the 80% hash split and scores the held-out",
        "20% (docs/s counts the FULL corpus in both cases):", "",
        "| docs | pagerank | docs/s | bow | docs/s |",
        "|---|---|---|---|---|",
    ]
    for t in tiers_out:
        lines.append(
            f"| {t['n_docs']:,} | {t['pagerank_sec']} s "
            f"| {t['pagerank_docs_per_sec']:,} | {t['bow_sec']} s "
            f"| {t['bow_docs_per_sec']:,} |"
        )
    lines.append("")
    from tools.mdsection import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        '## Tiered: link-graph PageRank + BoW classifier (round 4)',
        "\n".join(lines),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
