#!/usr/bin/env python
"""Interleaved A/B of round-1 vs current code for the two driver-bench
regressions flagged in VERDICT r2 (q6_dedup_minhash +53%, extraction
throughput -22%): alternate fresh processes A B A B ... on the SAME host
window so host drift hits both sides equally (the methodology the repo
established for the Arrow batch-size A/B, config.py).

Usage:
  python tools/ab_q6.py worker <repo_path>     # one timing process
  python tools/ab_q6.py [reps]                 # orchestrate A/B
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "120000"))
CACHE = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")


def worker(repo: str) -> None:
    import time

    sys.path.insert(0, repo)
    from cloud_ocr_summarizer_spark.operators.extract_arrow_native import (
        extract_span_rows_arrow_native,
    )
    from cloud_ocr_summarizer_spark.plans import queries as Q
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="ab-q6", cores=32)
    docs = spark.read.parquet(os.path.join(CACHE, f"bench_docs_{N_DOCS}.parquet"))

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    out = {}
    for name, fn in (
        ("q1_extract", lambda: force(extract_span_rows_arrow_native(docs))),
        ("q6_minhash", lambda: force(Q.q_dedup_minhash_lsh(spark, SF_DIR))),
    ):
        fn()  # warm-up
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
    print("ABRESULT " + json.dumps(out))


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2])
        return 0
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sides = {"r1": "/tmp/r1_code", "cur": "/root/repo"}
    results: dict[str, list[dict]] = {k: [] for k in sides}
    for i in range(reps):
        for name, repo in sides.items():
            env = dict(os.environ, PYTHONPATH=repo)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker", repo],
                capture_output=True, text=True, cwd=repo, env=env,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("ABRESULT ")]
            if not line:
                print(f"FAILED {name} rep {i}: {p.stderr[-2000:]}")
                return 1
            r = json.loads(line[0][len("ABRESULT "):])
            results[name].append(r)
            print(f"rep {i} {name}: {r}", flush=True)
    summary = {
        side: {
            q: round(min(r[q] for r in runs), 3)
            for q in runs[0]
        }
        for side, runs in results.items()
    }
    print(json.dumps({"best_of_reps": summary, "reps": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
