#!/usr/bin/env python
"""Tiered throughput for the round-5 structured-web families:
HTML table-grid extraction (map-only), sitemap urlset round trip
(window + bounded-shard groupBy + map parse), rarity-weighted keywords
(wordcount + frequency-split df join + per-doc window), and integer
HITS (iterative, 2 joins + 2 aggs per round).  docs/s must rise (or
hold) with corpus size.  Writes BENCH/webstruct.json + a BASELINE.md
section (replace-in-place).
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
    from cloud_ocr_summarizer_spark.operators.htmltable import (
        derive_tables_html_from_documents,
        extract_tables,
    )
    from cloud_ocr_summarizer_spark.operators.linkgraph import (
        derive_linkgraph_html_from_documents,
        extract_outlinks,
        hits_scores,
    )
    from cloud_ocr_summarizer_spark.operators.sitemap import (
        derive_sitemap_xml_from_documents,
        parse_sitemap_urls,
    )
    from cloud_ocr_summarizer_spark.operators.textstats import (
        top_terms_per_doc,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-webstruct", cores=32)

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
        t_tables = timed(
            lambda: extract_tables(derive_tables_html_from_documents(docs))
        )
        t_sitemap = timed(
            lambda: parse_sitemap_urls(
                derive_sitemap_xml_from_documents(langed, max_urls=50_000)
            )
        )
        t_terms = timed(lambda: top_terms_per_doc(docs, k=5))

        def _hits():
            edges = extract_outlinks(
                derive_linkgraph_html_from_documents(docs)
            )
            return hits_scores(docs, edges, n_iter=3)

        t_hits = timed(_hits)
        tiers.append(
            {
                "n_docs": n,
                "tables_sec": round(t_tables, 3),
                "tables_docs_per_sec": round(n / t_tables, 1),
                "sitemap_sec": round(t_sitemap, 3),
                "sitemap_docs_per_sec": round(n / t_sitemap, 1),
                "top_terms_sec": round(t_terms, 3),
                "top_terms_docs_per_sec": round(n / t_terms, 1),
                "hits_sec": round(t_hits, 3),
                "hits_docs_per_sec": round(n / t_hits, 1),
            }
        )
        print(json.dumps(tiers[-1]), flush=True)

    with open(
        os.path.join(REPO, "BENCH", "webstruct.json"), "w", encoding="utf-8"
    ) as f:
        json.dump({"tiers": tiers}, f)

    header = "## Tiered: structured-web families (tables / sitemap / keywords / HITS)"
    lines = [
        header, "",
        "local[32], warm best-of-2; tables = map-only grid extraction,",
        "sitemap = shard synthesis + urlset parse round trip (50k-entry",
        "protocol cap), keywords = tf/df with the frequency-split join,",
        "HITS = 3 integer rounds over the derived link graph:", "",
        "| docs | tables | docs/s | sitemap | docs/s | keywords | docs/s | HITS | docs/s |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for t in tiers:
        lines.append(
            f"| {t['n_docs']:,} | {t['tables_sec']} s "
            f"| {t['tables_docs_per_sec']:,} | {t['sitemap_sec']} s "
            f"| {t['sitemap_docs_per_sec']:,} | {t['top_terms_sec']} s "
            f"| {t['top_terms_docs_per_sec']:,} | {t['hits_sec']} s "
            f"| {t['hits_docs_per_sec']:,} |"
        )
    lines.append("")
    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"), header, "\n".join(lines)
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
