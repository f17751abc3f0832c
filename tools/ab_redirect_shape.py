#!/usr/bin/env python
"""A/B: carry-through vs early-exit ``resolve_redirects`` loop shapes.

Round 5's fourth window changed the resolver's loop shape: finished
chains (terminal reached, loop closed) now EXIT the hop loop at the hop
that finishes them instead of being carried through every remaining
hop join as dead weight.  This tool pins that change with an
interleaved same-JVM A/B — both shapes, run back to back on the same
cached inputs — over three 1M-doc workloads:

- ``uniform``  — the scaling-bench ledger (``derive_redirects_from_
  documents``: mixed 1..4-hop chains, loops, truncations; ~750k edges).
- ``flat1hop`` — 500k one-hop edges to 500k DISTINCT terminals (every
  chain finishes at hop 1; measures pure carry-through overhead).
- ``hot1dst``  — the SAME 500k one-hop edges collapsed onto ONE
  destination (the hot-canonical-target skew case; the controlled pair
  of BENCH/redirect_skew.json).

The old shape is embedded below verbatim (from git history, commit
6bcdf30) rather than checked out, so the A/B is reproducible from any
working tree.  Both shapes produce identical results by construction
(the early-exit rows are the rows whose state no longer changes);
``tests/test_redirects.py`` pins the resolver's values, and this tool
asserts row-count equality on the uniform workload as a cheap guard.

Writes BENCH/ab_redirect_shape.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from cloud_ocr_summarizer_spark.operators.redirects import (  # noqa: E402
    REDIRECT_MAX_HOPS,
    _STATUS_LOOP,
    _STATUS_OK,
    _STATUS_TRUNCATED,
    _rurl,
    derive_redirects_from_documents,
    resolve_redirects as resolve_new,
)
from cloud_ocr_summarizer_spark.session import get_spark  # noqa: E402
from tools.bench_html_layout import build_corpus  # noqa: E402

N_DOCS = 1_000_000
REPS = 3


def resolve_old(
    edges: DataFrame,
    urls: DataFrame | None = None,
    *,
    max_hops: int = REDIRECT_MAX_HOPS,
) -> DataFrame:
    """The pre-early-exit loop shape (carry-through), embedded verbatim.

    Every row — finished or not — rides through all ``max_hops`` joins
    with a NULL-guarded status column; the hot post-collapse state is
    re-joined on the shared key at every remaining hop.
    """
    e = edges.select(
        F.col("src_url").alias("_src"), F.col("dst_url").alias("_dst")
    )
    if urls is None:
        state = e.select(F.col("_src").alias("url")).distinct()
    else:
        state = urls.select(F.col("url").cast("string").alias("url"))
    state = state.select(
        "url",
        F.col("url").alias("final_url"),
        F.lit(0).alias("n_hops"),
        F.array(F.col("url")).alias("visited"),
        F.lit(None).cast("string").alias("status"),
    )
    for _ in range(max_hops):
        j = state.join(e, state["final_url"] == e["_src"], "left")
        open_row = F.col("status").isNull()
        advanced = open_row & F.col("_dst").isNotNull()
        looped = advanced & F.array_contains(F.col("visited"), F.col("_dst"))
        state = j.select(
            "url",
            F.when(advanced, F.col("_dst"))
            .otherwise(F.col("final_url"))
            .alias("final_url"),
            F.when(advanced, F.col("n_hops") + 1)
            .otherwise(F.col("n_hops"))
            .alias("n_hops"),
            F.when(
                advanced & ~looped,
                F.array_append(F.col("visited"), F.col("_dst")),
            )
            .otherwise(F.col("visited"))
            .alias("visited"),
            F.when(looped, F.lit(_STATUS_LOOP))
            .when(open_row & F.col("_dst").isNull(), F.lit(_STATUS_OK))
            .otherwise(F.col("status"))
            .alias("status"),
        )
    probe = state.join(e, state["final_url"] == e["_src"], "left")
    return probe.select(
        "url",
        "final_url",
        F.col("n_hops").cast("int").alias("n_hops"),
        F.coalesce(
            F.col("status"),
            F.when(
                F.col("_dst").isNotNull(), F.lit(_STATUS_TRUNCATED)
            ).otherwise(F.lit(_STATUS_OK)),
        ).alias("status"),
    )


def main() -> int:
    spark = get_spark(app_name="ab-redirect-shape", cores=8)
    docs = spark.read.parquet(build_corpus(spark, N_DOCS))
    d = F.col("doc_id")

    uniform = derive_redirects_from_documents(docs)
    srcs = docs.where(d % 2 == 1)
    flat = srcs.select(
        _rurl(d).alias("src_url"),
        F.lit(301).alias("http_status"),
        _rurl(d + N_DOCS).alias("dst_url"),
    )
    hot = srcs.select(
        _rurl(d).alias("src_url"),
        F.lit(301).alias("http_status"),
        _rurl(F.lit(0)).alias("dst_url"),
    )

    assert resolve_old(uniform).count() == resolve_new(uniform).count()

    def wall(fn, ledger) -> float:
        t0 = time.monotonic()
        fn(ledger).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    out: dict[str, float] = {}
    for wname, ledger in (
        ("uniform", uniform), ("flat1hop", flat), ("hot1dst", hot)
    ):
        # Interleave reps so host drift hits both shapes equally.
        olds, news = [], []
        wall(resolve_old, ledger)  # warm
        wall(resolve_new, ledger)
        for _ in range(REPS):
            olds.append(wall(resolve_old, ledger))
            news.append(wall(resolve_new, ledger))
        out[f"old_carry/{wname}"] = round(min(olds), 3)
        out[f"new_exit/{wname}"] = round(min(news), 3)
        print(wname, out[f"old_carry/{wname}"], out[f"new_exit/{wname}"],
              flush=True)

    result = {
        "job": "resolve_redirects loop shape A/B (interleaved, best-of-%d)"
               % REPS,
        "n_docs": N_DOCS,
        "cores": 8,
        "walls_sec": out,
        "speedup_new_over_old": {
            w: round(out[f"old_carry/{w}"] / out[f"new_exit/{w}"], 3)
            for w in ("uniform", "flat1hop", "hot1dst")
        },
    }
    with open(os.path.join(REPO, "BENCH", "ab_redirect_shape.json"), "w",
              encoding="utf-8") as f:
        json.dump(result, f)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
