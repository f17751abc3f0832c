#!/usr/bin/env python
"""Tiered throughput for the round-5 third-window families:
redirect-chain resolution (max_hops+1 unique-key joins), C4 line
cleaning (row-local split/classify/rejoin), RSS/Atom feed round trip
(newest-N window + map parse), and head-metadata extraction (map-only).
docs/s must rise (or hold) with corpus size.  Writes
BENCH/crawlmeta.json + a BASELINE.md section (replace-in-place).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_html_layout import build_corpus, with_synthetic_lang  # noqa: E402
from tools.mdsection import replace_section  # noqa: E402

TIERS = [
    int(x)
    for x in os.environ.get(
        "SPARK_GRAFT_TIERS", "120000,1000000"
    ).split(",")
]


def main() -> int:
    from cloud_ocr_summarizer_spark.operators.feeds import (
        derive_feeds_from_documents,
        parse_feed_entries,
    )
    from cloud_ocr_summarizer_spark.operators.headmeta import (
        derive_head_html_from_documents,
        extract_head_meta,
    )
    from cloud_ocr_summarizer_spark.operators.linesclean import (
        c4_line_filter,
        derive_noisy_lines_from_documents,
    )
    from cloud_ocr_summarizer_spark.operators.redirects import (
        derive_redirects_from_documents,
        resolve_redirects,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-crawlmeta", cores=32)

    def timed(make_df) -> float:
        def run() -> float:
            t0 = time.monotonic()
            make_df().write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        run()
        return min(run() for _ in range(2))

    tiers = []
    for n in TIERS:
        docs = spark.read.parquet(build_corpus(spark, n))
        langed = with_synthetic_lang(docs)
        t_redirect = timed(
            lambda: resolve_redirects(derive_redirects_from_documents(docs))
        )
        t_c4 = timed(
            lambda: c4_line_filter(derive_noisy_lines_from_documents(docs))
        )
        t_feeds = timed(
            lambda: parse_feed_entries(derive_feeds_from_documents(langed))
        )
        t_head = timed(
            lambda: extract_head_meta(derive_head_html_from_documents(langed))
        )
        tiers.append(
            {
                "n_docs": n,
                "redirect_sec": round(t_redirect, 3),
                "redirect_docs_per_sec": round(n / t_redirect, 1),
                "c4_sec": round(t_c4, 3),
                "c4_docs_per_sec": round(n / t_c4, 1),
                "feeds_sec": round(t_feeds, 3),
                "feeds_docs_per_sec": round(n / t_feeds, 1),
                "head_sec": round(t_head, 3),
                "head_docs_per_sec": round(n / t_head, 1),
            }
        )
        print(json.dumps(tiers[-1]), flush=True)

    with open(
        os.path.join(REPO, "BENCH", "crawlmeta.json"), "w", encoding="utf-8"
    ) as f:
        json.dump({"tiers": tiers}, f)

    header = "## Tiered: crawl-metadata families (redirects / C4 lines / feeds / head-meta)"
    lines = [
        header, "",
        "local[32], warm best-of-2; redirects = 5 unique-key equi-joins",
        "(bounded visited state), C4 = row-local line classify/filter,",
        "feeds = newest-4 window + RSS/Atom parse round trip, head-meta",
        "= map-only head-scoped extraction (synthesis pays a 1:1",
        "predecessor self-join):", "",
        "| docs | redirects | docs/s | C4 | docs/s | feeds | docs/s | head | docs/s |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for t in tiers:
        lines.append(
            f"| {t['n_docs']:,} | {t['redirect_sec']} s "
            f"| {t['redirect_docs_per_sec']:,} | {t['c4_sec']} s "
            f"| {t['c4_docs_per_sec']:,} | {t['feeds_sec']} s "
            f"| {t['feeds_docs_per_sec']:,} | {t['head_sec']} s "
            f"| {t['head_docs_per_sec']:,} |"
        )
    lines.append("")
    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"), header, "\n".join(lines)
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
