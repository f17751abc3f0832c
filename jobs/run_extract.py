#!/usr/bin/env python
"""spark-submit entry point for the flagship extraction job.

Packaging (north_rule: ships via --py-files):

    cd /root/repo && zip -r /tmp/cos_spark.zip cloud_ocr_summarizer_spark
    spark-submit --py-files /tmp/cos_spark.zip jobs/run_extract.py \
        --input  <parquet-or-iceberg path of (doc_id, spans)> \
        --output <snapshot sink root> \
        --lineage <metrics sink root> \
        --repartition 4096

The session comes from spark-submit's conf (master/executors set there);
this script only sets SQL-level knobs.  Re-running after a failure resumes
from the committed snapshots (left_anti on doc_id) — idempotent.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--lineage", default=None)
    p.add_argument("--raw-debug", default=None,
                   help="snapshot root for the gated raw-input debug sink")
    p.add_argument("--repartition", type=int, default=None)
    p.add_argument("--min-confidence", type=float, default=0.0)
    args = p.parse_args()

    spark = (
        SparkSession.builder.appName("cloud-ocr-summarizer-spark-extract")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from cloud_ocr_summarizer_spark.plans.flagship import run_flagship

    input_df = spark.read.parquet(args.input)
    result = run_flagship(
        spark,
        input_df,
        output_root=args.output,
        lineage_root=args.lineage,
        raw_debug_root=args.raw_debug,
        repartition_to=args.repartition,
        min_confidence=args.min_confidence,
    )
    print(
        f"run_id={result.run_id} snapshot={result.snapshot_id} "
        f"docs_written={result.docs_written}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
