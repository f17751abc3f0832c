#!/usr/bin/env python
"""Tiered throughput protocol (BASELINE.md: sandbox tiers 10^4/10^5/10^6
docs, fixed seed): flagship extraction docs/sec per tier at local[32].
Writes BENCH/tiers.json and appends the table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cloud_ocr_summarizer_spark.operators.extract_arrow_native import (  # noqa: E402
    extract_span_rows_arrow_native,
)
from cloud_ocr_summarizer_spark.datagen import interleaved_docs  # noqa: E402
from cloud_ocr_summarizer_spark.session import get_spark  # noqa: E402


def main() -> int:
    tiers = [10_000, 100_000, 1_000_000, 4_000_000, 10_000_000]
    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")
    os.makedirs(cache, exist_ok=True)
    spark = get_spark(app_name="bench-tiers", cores=32)

    results = []
    for n in tiers:
        path = os.path.join(cache, f"bench_docs_{n}.parquet")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            interleaved_docs(spark, n, seed=42, partitions=max(32, n // 4000)).write.mode(
                "overwrite"
            ).parquet(path)
        docs = spark.read.parquet(path)

        def run() -> float:
            t0 = time.monotonic()
            extract_span_rows_arrow_native(docs).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.monotonic() - t0

        run()  # warm-up
        best = min(run() for _ in range(3))
        results.append(
            {"n_docs": n, "sec": round(best, 3), "docs_per_sec": round(n / best, 1)}
        )
        print(json.dumps(results[-1]))

    with open(os.path.join(REPO, "BENCH", "tiers.json"), "w", encoding="utf-8") as f:
        json.dump(results, f)

    def label(n: int) -> str:
        # 4_000_000 is 4x10^6, not 10^6 — derive mantissa x exponent
        exp = len(str(n)) - 1
        mant = n // (10 ** exp)
        prefix = f"{mant}x" if mant != 1 else ""
        return f"{prefix}10^{exp} ({n:,})"

    header = "## Tiered throughput (flagship extraction, local[32], seed=42)"
    lines = [
        header,
        "",
        "| docs | wall (best of 3, warm) | docs/sec |",
        "|---|---|---|",
    ]
    for r in results:
        lines.append(f"| {label(r['n_docs'])} | {r['sec']} s | {r['docs_per_sec']:,} |")
    section = "\n".join(lines) + "\n"

    # replace this tool's own section in place (appending blindly
    # duplicated the table in rounds 1 and 2); other sections untouched
    from tools.mdsection import replace_section
    replace_section(os.path.join(REPO, "BENCH", "BASELINE.md"), header, section)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
