#!/usr/bin/env python
"""Interleaved A/B of round-3 vs current code for the three bench rows
that inflated in BENCH_r04 (q8_curation_pipeline 1.29x, q9_language_id
1.21x, q16_curation_gates 1.48x — VERDICT r4 "watch item").  Alternate
fresh processes r3 cur r3 cur ... inside ONE host window so drift hits
both sides equally (the repo's established methodology: tools/ab_q6.py,
the Arrow batch-size A/B in config.py).

The r3 side is a `git archive a4800b3` export (the round-3 boundary
commit, which includes the suspect `_quality_bp_sql` refactor's
PREDECESSOR code).  Both sides run the identical protocol the bench
uses for these rows: sf0.1 documents table, warm-up + best-of-3 inner
reps, local[32].

Usage:
  python tools/ab_q8_q16.py worker <repo_path>   # one timing process
  python tools/ab_q8_q16.py [reps]               # orchestrate (default 5)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
R3_CODE = os.environ.get("SPARK_GRAFT_R3_CODE", "/tmp/r3_code")


def worker(repo: str) -> None:
    import time

    sys.path.insert(0, repo)
    from cloud_ocr_summarizer_spark.plans import queries as Q
    from cloud_ocr_summarizer_spark.plans.curate import curate_documents
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="ab-q8-q16", cores=32)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    out = {}
    for name, fn in (
        (
            "q8_curation_pipeline",
            lambda: force(
                curate_documents(
                    docs, parallelism=spark.sparkContext.defaultParallelism
                )
            ),
        ),
        (
            "q9_language_id",
            lambda: force(Q.q_language_id_ngram(spark, SF_DIR)),
        ),
        (
            "q16_curation_gates",
            lambda: force(Q.q_curation_gates_rowlocal(spark, SF_DIR)),
        ),
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cur_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sides = {"r3": R3_CODE, "cur": cur_repo}
    results: dict[str, list[dict]] = {k: [] for k in sides}
    for i in range(reps):
        for name, repo in sides.items():
            env = dict(os.environ, PYTHONPATH=repo)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker", repo],
                capture_output=True, text=True, cwd=repo, env=env,
            )
            line = [
                l for l in p.stdout.splitlines() if l.startswith("ABRESULT ")
            ]
            if not line:
                print(f"FAILED {name} rep {i}: {p.stderr[-2000:]}")
                return 1
            r = json.loads(line[0][len("ABRESULT "):])
            results[name].append(r)
            print(f"rep {i} {name}: {r}", flush=True)
    summary = {
        side: {q: round(min(r[q] for r in runs), 3) for q in runs[0]}
        for side, runs in results.items()
    }
    ratios = {
        q: round(summary["cur"][q] / summary["r3"][q], 3)
        for q in summary["cur"]
    }
    print(json.dumps({"best_of_reps": summary, "cur_over_r3": ratios}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
