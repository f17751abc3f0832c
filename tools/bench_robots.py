#!/usr/bin/env python
"""Tiered throughput for the robots.txt compliance family
(operators/robotstxt.py): URL synthesis -> parse -> per-host robots
synthesis -> parse rules -> longest-match gate, all in one timed job.
The gate is row-local after a single host equi-join (the rules side is
host-count-sized), so docs/s must RISE with corpus size.  Writes
BENCH/robots.json + a BASELINE.md section (replace-in-place).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_html_layout import build_corpus  # noqa: E402
from tools.mdsection import replace_section  # noqa: E402

TIERS = [120_000, 1_000_000]


def main() -> int:
    from tools.bench_html_layout import with_synthetic_lang

    from cloud_ocr_summarizer_spark.operators.robotstxt import (
        crawl_frontier,
        derive_robots_txt_from_documents,
        parse_robots_rules,
        robots_txt_gate,
    )
    from cloud_ocr_summarizer_spark.operators.urls import (
        derive_urls_from_documents,
        parse_urls,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-robots", cores=32)

    def timed(make_df) -> float:
        def run() -> float:
            t0 = time.monotonic()
            make_df().write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        run()
        return min(run() for _ in range(2))

    tiers = []
    for n in TIERS:
        # the shared bench corpus carries (doc_id, text, source); the
        # URL deriver additionally reads lang — the shared helper keeps
        # the assignment identical across every tool that routes
        # through the URL synthesis
        docs = with_synthetic_lang(
            spark.read.parquet(build_corpus(spark, n))
        )

        def gate_job(d=docs):
            parsed = parse_urls(derive_urls_from_documents(d))
            return robots_txt_gate(
                parsed, derive_robots_txt_from_documents(d, parsed_urls=parsed)
            )

        def rules_job(d=docs):
            return parse_robots_rules(derive_robots_txt_from_documents(d))

        def frontier_job(d=docs):
            parsed = parse_urls(derive_urls_from_documents(d))
            return crawl_frontier(
                parsed, derive_robots_txt_from_documents(d, parsed_urls=parsed)
            )

        gate = timed(gate_job)
        rules = timed(rules_job)
        frontier = timed(frontier_job)
        tiers.append(
            {
                "n_docs": n,
                "gate_sec": round(gate, 3),
                "gate_docs_per_sec": round(n / gate, 1),
                "rules_sec": round(rules, 3),
                "frontier_sec": round(frontier, 3),
                "frontier_docs_per_sec": round(n / frontier, 1),
            }
        )
        print(json.dumps(tiers[-1]), flush=True)

    with open(os.path.join(REPO, "BENCH", "robots.json"), "w",
              encoding="utf-8") as f:
        json.dump({"tiers": tiers}, f)

    header = "## Tiered: robots.txt longest-match gate"
    lines = [
        header, "",
        "local[32], warm best-of-2; gate = URL synthesis+parse, per-host",
        "robots synthesis+parse, RFC 9309 longest-match resolution (one",
        "host equi-join, row-local match); rules = the distinct-host",
        "parse alone; frontier = the composed blocklist -> robots ->",
        "per-host budget pipeline (every exchange host-keyed,",
        "plan-asserted):", "",
        "| docs | gate | docs/s | rules parse | frontier | docs/s |",
        "|---|---|---|---|---|---|",
    ]
    for t in tiers:
        lines.append(
            f"| {t['n_docs']:,} | {t['gate_sec']} s "
            f"| {t['gate_docs_per_sec']:,} | {t['rules_sec']} s "
            f"| {t['frontier_sec']} s | {t['frontier_docs_per_sec']:,} |"
        )
    lines.append("")
    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"), header,
        "\n".join(lines),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
