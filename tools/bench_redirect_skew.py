#!/usr/bin/env python
"""Hot-destination skew tier for redirect resolution.

Claim under test (operators/redirects.py docstring): a hot canonical
target fans in on the VALUE side only, because the join key at every
hop is the chain's CURRENT url and the edge side has unique keys; no
key ever multiplies, so the hot wall must track the uniform wall.
CONTROLLED pair: both arms are the SAME 500k one-hop edges — only the
destination distribution differs (distinct out-of-universe terminals
vs ONE shared URL), so the ratio isolates the skew effect (an earlier
draft compared different edge counts and chain shapes; its 0.78x was
confounded by input size).  This is the redirect twin of
BENCH/graph_skew.json (where per-key AGGREGATION needs salting).

Writes BENCH/redirect_skew.json + a BASELINE.md section
(replace-in-place).
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

N_DOCS = 1_000_000


def main() -> int:
    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.operators.redirects import (
        _rurl,
        resolve_redirects,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-redirect-skew", cores=32)
    docs = spark.read.parquet(build_corpus(spark, N_DOCS))

    # controlled comparison: SAME 500k sources, SAME all-1-hop chain
    # shape — only the destination distribution differs (distinct
    # out-of-universe terminals vs one shared terminal), so any wall
    # delta is the skew effect alone
    d = F.col("doc_id")
    srcs = docs.where(d % 2 == 1)
    uniform = srcs.select(
        _rurl(d).alias("src_url"),
        F.lit(301).alias("http_status"),
        _rurl(d + N_DOCS).alias("dst_url"),
    )
    hot = srcs.select(
        _rurl(d).alias("src_url"),
        F.lit(301).alias("http_status"),
        _rurl(F.lit(0)).alias("dst_url"),
    )

    def timed(edges) -> float:
        def run() -> float:
            t0 = time.monotonic()
            resolve_redirects(edges).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.monotonic() - t0

        run()
        return min(run() for _ in range(2))

    t_uniform = timed(uniform)
    t_hot = timed(hot)
    out = {
        "n_docs": N_DOCS,
        "uniform_sec": round(t_uniform, 3),
        "hot_sec": round(t_hot, 3),
        "hot_over_uniform": round(t_hot / t_uniform, 3),
        "hot_shape": "500k 1-hop edges -> ONE dst vs 500k 1-hop edges"
        " -> distinct dsts (same edge count, same chain shape)",
    }
    with open(
        os.path.join(REPO, "BENCH", "redirect_skew.json"), "w", encoding="utf-8"
    ) as f:
        json.dump(out, f)
    print(json.dumps(out))

    header = "## Hot-destination skew: redirect resolution"
    lines = [
        header, "",
        "1M docs, local[32], warm best-of-2.  CONTROLLED pair: both",
        "arms are the same 500k one-hop edges; only the destination",
        "distribution differs (distinct terminals vs ONE shared URL).",
        "The join key per hop is the chain's current url (unique on",
        "the edge side), so the hot destination fans in on the value",
        "side only — no key multiplies:", "",
        "| ledger | wall | hot/uniform |", "|---|---|---|",
        f"| 500k -> distinct dsts | {out['uniform_sec']} s | — |",
        f"| 500k -> ONE dst | {out['hot_sec']} s | {out['hot_over_uniform']} |",
        "",
    ]
    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"), header, "\n".join(lines)
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
