#!/usr/bin/env python
"""Tiered throughput + N->4N scaling for the late-round-3 surfaces:

* PDF content-stream parse (operators/pdfstream.parse_pdf_text_spans,
  Arrow-batched vectorized token state machine)
* composed pdf_main_text (parse + one groupBy + broadcast left join)
* text-density block classification (operators/dom.extract_html_density)

Tiers run at local[32] on the same cached corpora as
tools/bench_html_layout.py; the scaling pair runs the PDF parse in
separate JVMs at local[2] vs local[8] — a third Python-worker-bound
data point for the north rule's two-cluster-size criterion.

Writes BENCH/pdf_density.json and appends a BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_html_layout import build_corpus  # noqa: E402  (same corpora)

TIERS = [120_000, 1_000_000, 4_000_000]
SCALING_DOCS = 240_000

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from cloud_ocr_summarizer_spark.session import get_spark
from cloud_ocr_summarizer_spark.datagen import derive_pdf_streams_from_documents
from cloud_ocr_summarizer_spark.operators.pdfstream import parse_pdf_text_spans

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark(app_name=f"pdf-scaling-{{cores}}", cores=cores)
docs = spark.read.parquet(path)

def run():
    t0 = time.monotonic()
    parse_pdf_text_spans(derive_pdf_streams_from_documents(docs)).write.format(
        "noop").mode("overwrite").save()
    return time.monotonic() - t0

run()  # warm-up
best = min(run() for _ in range(2))
print(json.dumps({{"cores": cores, "sec": round(best, 3),
                   "docs_per_sec": round(n_docs / best, 1)}}))
"""


def child(cores: int, n_docs: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO),
         str(cores), str(n_docs), path],
        capture_output=True, text=True, timeout=1800, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    from cloud_ocr_summarizer_spark.datagen import (
        derive_density_html_from_documents,
        derive_pdf_streams_from_documents,
    )
    from cloud_ocr_summarizer_spark.operators.dom import extract_html_density
    from cloud_ocr_summarizer_spark.operators.pdfstream import (
        assemble_pdf_main_text,
        parse_pdf_text_spans,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-pdf-density", cores=32)

    def timed(make_df) -> float:
        def run() -> float:
            t0 = time.monotonic()
            make_df().write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        run()  # warm-up
        return min(run() for _ in range(3))

    tiers = []
    for n in TIERS:
        path = build_corpus(spark, n)
        docs = spark.read.parquet(path)
        pdfs = derive_pdf_streams_from_documents(docs)
        spans_s = timed(lambda: parse_pdf_text_spans(pdfs))
        main_s = timed(
            lambda: assemble_pdf_main_text(docs, parse_pdf_text_spans(pdfs))
        )
        density_s = timed(
            lambda: extract_html_density(derive_density_html_from_documents(docs))
        )
        row = {
            "n_docs": n,
            "pdf_spans_sec": round(spans_s, 3),
            "pdf_spans_docs_per_sec": round(n / spans_s, 1),
            "pdf_main_sec": round(main_s, 3),
            "pdf_main_docs_per_sec": round(n / main_s, 1),
            "density_sec": round(density_s, 3),
            "density_docs_per_sec": round(n / density_s, 1),
        }
        tiers.append(row)
        print(json.dumps(row))
    spath = build_corpus(spark, SCALING_DOCS)
    spark.stop()

    lows, highs = [], []
    for _ in range(2):
        lows.append(child(2, SCALING_DOCS, spath))
        highs.append(child(8, SCALING_DOCS, spath))
    low = min(lows, key=lambda r: r["sec"])
    high = min(highs, key=lambda r: r["sec"])
    eff = round((high["docs_per_sec"] / low["docs_per_sec"]) / 4.0, 3)
    result = {"tiers": tiers, "scaling": {
        "n_docs": SCALING_DOCS, "localN": low, "local4N": high,
        "scaling_efficiency_N_to_4N": eff,
    }}
    print(json.dumps(result["scaling"]))
    with open(os.path.join(REPO, "BENCH", "pdf_density.json"), "w",
              encoding="utf-8") as f:
        json.dump(result, f)

    lines = [
        "## PDF parse + text-density: tiers and N->4N scaling", "",
        "PDF content-stream parse (Arrow token state machine), composed",
        "pdf_main_text (parse + groupBy + broadcast join), and text-density",
        "block classification, local[32], seed=42, best-of-3 warm:", "",
        "| docs | pdf spans | docs/s | pdf main | docs/s | text-density | docs/s |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in tiers:
        lines.append(
            f"| {r['n_docs']:,} | {r['pdf_spans_sec']} s | "
            f"{r['pdf_spans_docs_per_sec']:,} | {r['pdf_main_sec']} s | "
            f"{r['pdf_main_docs_per_sec']:,} | {r['density_sec']} s | "
            f"{r['density_docs_per_sec']:,} |"
        )
    lines += [
        "",
        f"PDF-parse scaling (N=local[2] -> 4N=local[8], {SCALING_DOCS:,} docs, "
        "separate JVMs, best-of-2 per level x2 rounds): "
        f"{low['docs_per_sec']:,} -> {high['docs_per_sec']:,} docs/s, "
        f"efficiency {eff} (third Python-worker-bound pair for the "
        "two-cluster-size rule).", "",
    ]
    from tools.mdsection import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        '## PDF parse + text-density: tiers and N->4N scaling',
        "\n".join(lines),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
