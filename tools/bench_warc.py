#!/usr/bin/env python
"""Tiered throughput for the crawl-container round trip
(operators/warc.py): synthesize record -> envelope parse -> 200-filter
-> DOM strip, plain (pure JVM) and gzip-member (Arrow-batched stdlib
codec — the Python-worker-bound regime).  docs/s must rise with corpus
size.  Writes BENCH/warc.json + a BASELINE.md section (replace-in-place).
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
    from cloud_ocr_summarizer_spark.operators.warc import (
        warc_main_text,
        warc_main_text_gz,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-warc", cores=32)

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
        plain = timed(lambda: warc_main_text(docs))
        gz = timed(lambda: warc_main_text_gz(docs))
        tiers.append(
            {
                "n_docs": n,
                "plain_sec": round(plain, 3),
                "plain_docs_per_sec": round(n / plain, 1),
                "gz_sec": round(gz, 3),
                "gz_docs_per_sec": round(n / gz, 1),
            }
        )
        print(json.dumps(tiers[-1]), flush=True)

    with open(os.path.join(REPO, "BENCH", "warc.json"), "w",
              encoding="utf-8") as f:
        json.dump({"tiers": tiers}, f)

    header = "## Tiered: crawl-container round trip (WARC parse + DOM strip)"
    lines = [
        header, "",
        "local[32], warm best-of-2; plain = pure-JVM envelope parse,",
        "gz = per-record gzip members through the Arrow codec stage",
        "(compress AND decompress inside the timed job):", "",
        "| docs | plain | docs/s | gzip members | docs/s |",
        "|---|---|---|---|---|",
    ]
    for t in tiers:
        lines.append(
            f"| {t['n_docs']:,} | {t['plain_sec']} s "
            f"| {t['plain_docs_per_sec']:,} | {t['gz_sec']} s "
            f"| {t['gz_docs_per_sec']:,} |"
        )
    lines.append("")
    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"), header,
        "\n".join(lines),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
