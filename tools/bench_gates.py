#!/usr/bin/env python
"""Tiered throughput for the word-level curation gates: Gopher quality
rules, intra-doc repeated-passage removal (doubled text so the gate
does real work), integer-milli Flesch-Kincaid, and the per-source cap
window.  Same cached corpora/protocol as the other tier benches.

Writes BENCH/gates.json and appends a BASELINE.md section.
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

    from cloud_ocr_summarizer_spark.operators.sampling import cap_per_source
    from cloud_ocr_summarizer_spark.operators.textstats import (
        dedup_intra_doc,
        gopher_quality_rules,
        readability_profile,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-gates", cores=32)

    def timed(make_df) -> float:
        def run() -> float:
            t0 = time.monotonic()
            make_df().write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        run()  # warm-up
        return min(run() for _ in range(3))

    tiers = []
    for n in TIERS:
        docs = spark.read.parquet(build_corpus(spark, n))
        doubled = docs.select(
            "doc_id",
            "source",
            F.concat(F.col("text"), F.lit(" "), F.col("text")).alias("text"),
        )
        gq = timed(lambda: gopher_quality_rules(docs, min_words=20))
        dd = timed(lambda: dedup_intra_doc(doubled))
        fk = timed(lambda: readability_profile(docs))
        cap = timed(lambda: cap_per_source(docs.select("doc_id", "source"), cap=1000))
        row = {
            "n_docs": n,
            "gopher_sec": round(gq, 3),
            "gopher_docs_per_sec": round(n / gq, 1),
            "intradoc_sec": round(dd, 3),
            "intradoc_docs_per_sec": round(n / dd, 1),
            "fk_sec": round(fk, 3),
            "fk_docs_per_sec": round(n / fk, 1),
            "cap_sec": round(cap, 3),
            "cap_docs_per_sec": round(n / cap, 1),
        }
        tiers.append(row)
        print(json.dumps(row))

    with open(os.path.join(REPO, "BENCH", "gates.json"), "w", encoding="utf-8") as f:
        json.dump({"tiers": tiers}, f)

    lines = [
        "## Word-level curation gates at tiers", "",
        "Gopher rules, intra-doc dedup (doubled text), integer-milli FK",
        "readability, and the per-source cap window, local[32], seed=42,",
        "best-of-3 warm:", "",
        "| docs | gopher | docs/s | intra-dedup | docs/s | FK | docs/s | source cap | docs/s |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in tiers:
        lines.append(
            f"| {r['n_docs']:,} | {r['gopher_sec']} s | "
            f"{r['gopher_docs_per_sec']:,} | {r['intradoc_sec']} s | "
            f"{r['intradoc_docs_per_sec']:,} | {r['fk_sec']} s | "
            f"{r['fk_docs_per_sec']:,} | {r['cap_sec']} s | "
            f"{r['cap_docs_per_sec']:,} |"
        )
    lines.append("")
    from tools.mdsection import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        '## Word-level curation gates at tiers',
        "\n".join(lines),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
