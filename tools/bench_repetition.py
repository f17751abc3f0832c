#!/usr/bin/env python
"""A/B the two repetition-gate forms at tiers:

  aggregated  — textstats.repetition_profile (explode + 2 shuffled
                hash aggregations; map-side partial agg)
  row-local   — textstats.repetition_flagged_col (array ops in one
                projection, zero shuffle — the streaming-gate form;
                O(distinct_words x n_tokens) per row via the nested
                HOF, so it is NOT automatically faster)

Both sides reduce to the same (doc_id, flagged) output so the timed
work is comparable.  Same cached corpora/protocol as the other tier
benches.  Writes BENCH/repetition.json and appends a BASELINE.md
section.
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

    from cloud_ocr_summarizer_spark.operators.textstats import (
        repetition_flagged_col,
        repetition_profile,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-repetition", cores=32)

    def once(make_df) -> float:
        t0 = time.monotonic()
        make_df().write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    tiers = []
    for n in TIERS:
        docs = spark.read.parquet(build_corpus(spark, n)).select("doc_id", "text")
        mk_agg = lambda: repetition_profile(docs).select("doc_id", "flagged")  # noqa: E731
        mk_rl = lambda: docs.select(  # noqa: E731
            "doc_id",
            F.coalesce(
                repetition_flagged_col(F.col("text")), F.lit(False)
            ).alias("flagged"),
        )
        # INTERLEAVED best-of-3: the host drifts between windows (see
        # BENCH/BASELINE.md host-noise notes), so A,B,A,B,A,B — never
        # time one side's reps back to back.
        once(mk_agg), once(mk_rl)  # warm both
        agg_ts, rl_ts = [], []
        for _ in range(3):
            agg_ts.append(once(mk_agg))
            rl_ts.append(once(mk_rl))
        agg, rowlocal = min(agg_ts), min(rl_ts)
        row = {
            "n_docs": n,
            "aggregated_sec": round(agg, 3),
            "aggregated_docs_per_sec": round(n / agg, 1),
            "rowlocal_sec": round(rowlocal, 3),
            "rowlocal_docs_per_sec": round(n / rowlocal, 1),
            "rowlocal_speedup": round(agg / rowlocal, 3),
        }
        tiers.append(row)
        print(json.dumps(row))

    with open(os.path.join(REPO, "BENCH", "repetition.json"), "w", encoding="utf-8") as f:
        json.dump({"tiers": tiers}, f)

    lines = [
        "## Repetition gate: aggregated vs row-local", "",
        "repetition_profile (explode + 2 shuffled aggs) vs the zero-",
        "shuffle repetition_flagged_col used by the streaming gates,",
        "both reduced to (doc_id, flagged); local[32], seed=42,",
        "best-of-3 warm:", "",
        "| docs | aggregated s | agg docs/s | row-local s | rl docs/s | rl speedup |",
        "|---|---|---|---|---|---|",
    ]
    for t in tiers:
        lines.append(
            "| {n_docs} | {aggregated_sec} | {aggregated_docs_per_sec} "
            "| {rowlocal_sec} | {rowlocal_docs_per_sec} | {rowlocal_speedup}x |".format(**t)
        )
    from tools.mdsection import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        '## Repetition gate: aggregated vs row-local',
        "\n".join(lines) + "\n",
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
