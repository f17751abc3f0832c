#!/usr/bin/env python
"""spark-submit entry point for the corpus-curation pipeline
(plans/curate.curate_documents: exact dedup -> MinHash near-dup removal
-> quality gate -> repetition gate -> language gate -> hash-bucket
train/val/test split).

    spark-submit --py-files /tmp/cos_spark.zip jobs/run_curate.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/curated [--lang en] [--min-quality 3000] \
        [--benchmark /data/eval_docs.parquet] [--redact-pii] \
        [--pack-budget 2048]

With --benchmark / --redact-pii / --pack-budget the job runs the FULL
pipeline (curate_documents_full: + decontamination, PII scrub, packing).
Output parquet is partitioned BY split, so downstream training reads one
directory per split; a one-line JSON stats summary goes to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--min-quality", type=int, default=3000,
                   help="basis points, see textstats.quality_score_col")
    p.add_argument("--lang", default=None, help="en|de|fr (default: keep all)")
    p.add_argument("--neardup-threshold", type=float, default=0.8)
    p.add_argument("--benchmark", default=None,
                   help="parquet of eval docs (doc_id, text); drop corpus "
                        "docs sharing an n-gram with it")
    p.add_argument("--contamination-n", type=int, default=8)
    p.add_argument("--redact-pii", action="store_true")
    p.add_argument("--pack-budget", type=int, default=None,
                   help="token budget per packed bin (enables packing)")
    args = p.parse_args()

    spark = (
        SparkSession.builder.appName("cloud-ocr-summarizer-spark-curate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from cloud_ocr_summarizer_spark.plans.curate import (
        curate_documents,
        curate_documents_full,
    )

    docs = spark.read.parquet(args.input)
    n_input = docs.count()
    core_kwargs = dict(
        min_quality=args.min_quality,
        lang=args.lang,
        neardup_threshold=args.neardup_threshold,
        parallelism=spark.sparkContext.defaultParallelism,
    )
    persisted: list = []
    if args.benchmark or args.redact_pii or args.pack_budget:
        # full pipeline: decontam / scrub / packing around the same core
        # (redaction always runs in the full variant; --redact-pii just
        # opts into the full path when no other full-stage flag is set)
        curated = curate_documents_full(
            docs,
            benchmark=(
                spark.read.parquet(args.benchmark) if args.benchmark else None
            ),
            contamination_n=args.contamination_n,
            mix_fractions=None,
            pack_budget=args.pack_budget,
            persisted=persisted,
            **core_kwargs,
        )
    else:
        curated = curate_documents(docs, **core_kwargs)
    curated.write.mode("overwrite").partitionBy("split").parquet(args.output)
    for df in persisted:  # release the pipeline's cached partitions
        df.unpersist()

    out = spark.read.parquet(args.output)
    stats = {
        "n_input": n_input,
        "n_curated": out.count(),
        "by_split": {
            r["split"]: r["n"]
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        },
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
