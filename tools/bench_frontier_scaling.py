#!/usr/bin/env python
"""N->4N scaling pair for the JOIN+AGG regime (crawl frontier).

Fifth execution-regime pair for the north rule's two-cluster-size
criterion (no real cluster in this sandbox): JVM-expression map
(tools/bench_scaling.py), Python-worker map (bench_html_layout),
one-shot shuffle (cross-doc dedup), iterative shuffle (PageRank) — and
now the composed join+aggregate shape: URL parse -> blocklist
broadcast anti-join -> robots host equi-join -> per-host aggregate,
run in SEPARATE JVMs at local[2] vs local[8] on the same 1M-doc input
(same protocol/caveats as the other pairs; both "cluster sizes" share
one page cache and shuffle substrate).

Writes BENCH/frontier_scaling.json + a BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_html_layout import build_corpus  # noqa: E402

N_DOCS = 1_000_000

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from cloud_ocr_summarizer_spark.session import get_spark
from cloud_ocr_summarizer_spark.operators.robotstxt import (
    crawl_frontier,
    derive_robots_txt_from_documents,
)
from cloud_ocr_summarizer_spark.operators.urls import (
    derive_urls_from_documents,
    parse_urls,
)
from tools.bench_html_layout import with_synthetic_lang

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark(app_name=f"frontier-scaling-{{cores}}", cores=cores)
docs = with_synthetic_lang(spark.read.parquet(path))

def run():
    t0 = time.monotonic()
    parsed = parse_urls(derive_urls_from_documents(docs))
    crawl_frontier(
        parsed, derive_robots_txt_from_documents(docs, parsed_urls=parsed)
    ).write.format("noop").mode("overwrite").save()
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
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-frontier-scaling", cores=8)
    path = build_corpus(spark, N_DOCS)
    spark.stop()  # children own the machine during their runs

    small = child(2, N_DOCS, path)
    big = child(8, N_DOCS, path)
    eff = (big["docs_per_sec"] / small["docs_per_sec"]) / 4.0
    out = {
        "job": "crawl_frontier (blocklist -> robots -> budget)",
        "n_docs": N_DOCS,
        "localN": small,
        "local4N": big,
        "scaling_efficiency_N_to_4N": round(eff, 3),
    }
    with open(os.path.join(REPO, "BENCH", "frontier_scaling.json"), "w",
              encoding="utf-8") as f:
        json.dump(out, f)
    print(json.dumps(out))

    lines = [
        "## N->4N scaling: join+aggregate regime (crawl frontier)",
        "",
        "Composed crawl-planning pipeline (URL parse, blocklist",
        "anti-join, robots host equi-join, per-host aggregate) over the",
        "1M-doc derived corpus, separate JVMs, warm best-of-2:", "",
        "| cluster size | wall | docs/s |", "|---|---|---|",
        f"| local[2] | {small['sec']} s | {small['docs_per_sec']:,} |",
        f"| local[8] | {big['sec']} s | {big['docs_per_sec']:,} |",
        "",
        f"Scaling efficiency N->4N: **{out['scaling_efficiency_N_to_4N']}**.",
        "Same shared-substrate caveat as the other shuffle pairs.",
        "",
    ]
    from tools.mdsection import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        "## N->4N scaling: join+aggregate regime (crawl frontier)",
        "\n".join(lines),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
