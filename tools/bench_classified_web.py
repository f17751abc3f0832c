#!/usr/bin/env python
"""Tiered throughput for the COMPLETE north-rule job: span extraction +
kind tagging + layout fold + full Readability classifier pair (link
density AND text density), fused into one zero-Exchange pass
(plans/extract_web.extract_web_documents_classified_fused).

Same cached corpora and protocol as tools/bench_html_layout.py /
bench_pdf_density.py.  Writes BENCH/classified_web.json and appends a
BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_html_layout import build_corpus  # noqa: E402

TIERS = [
    int(x)
    for x in os.environ.get(
        "SPARK_GRAFT_TIERS", "120000,1000000,4000000"
    ).split(",")
]


def main() -> int:
    from cloud_ocr_summarizer_spark.plans.extract_web import (
        extract_web_documents_classified_fused,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-classified-web", cores=32)

    def timed(make_df, reps: int) -> float:
        def run() -> float:
            t0 = time.monotonic()
            make_df().write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        run()  # warm-up
        return min(run() for _ in range(reps))

    tiers = []
    for n in TIERS:
        docs = spark.read.parquet(build_corpus(spark, n))
        # 10^7 runs minutes per rep; best-of-2 there (JVM warm-up is <5%
        # at that size — the bench_curation_full precedent)
        sec = timed(
            lambda: extract_web_documents_classified_fused(docs),
            3 if n <= 4_000_000 else 2,
        )
        row = {
            "n_docs": n,
            "sec": round(sec, 3),
            "docs_per_sec": round(n / sec, 1),
        }
        tiers.append(row)
        print(json.dumps(row))

    with open(os.path.join(REPO, "BENCH", "classified_web.json"), "w",
              encoding="utf-8") as f:
        json.dump({"tiers": tiers}, f)

    lines = [
        "## Complete north-rule job (extract_web_classified_fused) at tiers",
        "",
        "Span extraction + kind tagging + layout fold + BOTH Readability",
        "heuristics (link density AND text density) in one zero-Exchange",
        "pass, local[32], seed=42, best-of-3 warm (best-of-2 at 10^7):", "",
        "| docs | wall | docs/s |", "|---|---|---|",
    ]
    for r in tiers:
        lines.append(f"| {r['n_docs']:,} | {r['sec']} s | {r['docs_per_sec']:,} |")
    lines.append("")
    from tools.mdsection import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        "## Complete north-rule job (extract_web_classified_fused) at tiers",
        "\n".join(lines),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
