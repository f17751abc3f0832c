#!/usr/bin/env python
"""N->4N scaling pair for the ITERATIVE-SHUFFLE regime (PageRank).

The north rule's two-cluster-size criterion is evidenced per execution
regime (no real cluster in this sandbox): JVM-expression map
(tools/bench_scaling.py), Python-worker map (bench_html_layout), one-
shot shuffle (cross-doc dedup, BENCH/crossdoc.json).  PageRank adds the
fourth regime — repeated corpus-sized shuffles with a lineage cut per
round — run in SEPARATE JVMs at local[2] vs local[8] on the same 1M-doc
input (same protocol as the other pairs; both "cluster sizes" share one
page cache and shuffle substrate, which understates real-cluster
scaling for shuffle-heavy jobs — see BENCH/BASELINE.md's calibration).

Writes BENCH/pagerank_scaling.json + a BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_html_layout import build_corpus  # noqa: E402

N_DOCS = 1_000_000

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from cloud_ocr_summarizer_spark.session import get_spark
from cloud_ocr_summarizer_spark.operators.linkgraph import (
    pagerank_over_documents,
)

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark(app_name=f"pagerank-scaling-{{cores}}", cores=cores)
docs = spark.read.parquet(path)

def run():
    t0 = time.monotonic()
    pagerank_over_documents(docs, n_iter=5).write.format(
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
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-pagerank-scaling", cores=8)
    path = build_corpus(spark, N_DOCS)
    spark.stop()  # children own the machine during their runs

    small = child(2, N_DOCS, path)
    big = child(8, N_DOCS, path)
    eff = (big["docs_per_sec"] / small["docs_per_sec"]) / 4.0
    out = {
        "job": "pagerank_over_documents(n_iter=5)",
        "n_docs": N_DOCS,
        "localN": small,
        "local4N": big,
        "scaling_efficiency_N_to_4N": round(eff, 3),
    }
    with open(os.path.join(REPO, "BENCH", "pagerank_scaling.json"), "w",
              encoding="utf-8") as f:
        json.dump(out, f)
    print(json.dumps(out))

    lines = [
        "## N->4N scaling: iterative-shuffle regime (PageRank)",
        "",
        "5-iteration integer PageRank over the 1M-doc derived corpus,",
        "separate JVMs, warm best-of-2 (same protocol as the other",
        "regime pairs):", "",
        "| cluster size | wall | docs/s |", "|---|---|---|",
        f"| local[2] | {small['sec']} s | {small['docs_per_sec']:,} |",
        f"| local[8] | {big['sec']} s | {big['docs_per_sec']:,} |",
        "",
        f"Scaling efficiency N->4N: **{out['scaling_efficiency_N_to_4N']}**.",
        "Iterative shuffles share one local shuffle substrate across both",
        "'cluster sizes' (the same caveat as the cross-doc dedup pair),",
        "so this lower-bounds what disjoint executors would show.",
        "",
    ]
    from tools.mdsection import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        "## N->4N scaling: iterative-shuffle regime (PageRank)",
        "\n".join(lines),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
