#!/usr/bin/env python
"""spark-submit entry point for the composed crawl-planning job.

Packaging (north_rule: ships via --py-files):

    cd /root/repo && zip -r /tmp/cos_spark.zip cloud_ocr_summarizer_spark
    spark-submit --py-files /tmp/cos_spark.zip jobs/run_crawl_plan.py \
        --urls      <parquet of (doc_id, url)> \
        --robots    <parquet of (host, robots_txt)> \
        --redirects <parquet of (src_url, http_status, dst_url), optional> \
        --output    <output root>

One job runs the whole frontier surface: URL parse (PSL registered
domains) -> optional redirect-chain resolution folded in per host ->
blocklist broadcast anti-join -> RFC 9309 robots longest-match ->
per-host crawl budget.  Shuffle inventory: the host equi-join + the
host aggregate (+ the redirect hop joins, whose iteration-invariant
edge shuffle AQE computes once and reuses).  Outputs land under
<output>/frontier, <output>/redirects (per-host rollup, when a ledger
is given), and <output>/ledger_audit (contract violations counted).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--urls", required=True)
    p.add_argument("--robots", required=True)
    p.add_argument("--redirects", default=None)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    spark = (
        SparkSession.builder.appName("cloud-ocr-summarizer-spark-crawl-plan")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    from cloud_ocr_summarizer_spark.operators.robotstxt import crawl_frontier
    from cloud_ocr_summarizer_spark.operators.urls import parse_urls

    parsed = parse_urls(spark.read.parquet(args.urls))
    robots = spark.read.parquet(args.robots)

    if args.redirects is not None:
        from cloud_ocr_summarizer_spark.operators.redirects import (
            dedup_ledger,
            frontier_redirect_rollup,
            redirect_ledger_audit,
            resolve_redirects,
        )

        edges = spark.read.parquet(args.redirects)
        redirect_ledger_audit(edges).write.mode("overwrite").parquet(
            os.path.join(args.output, "ledger_audit")
        )
        resolved = resolve_redirects(dedup_ledger(edges))
        frontier_redirect_rollup(parsed, resolved).write.mode(
            "overwrite"
        ).parquet(os.path.join(args.output, "redirects"))

    frontier = crawl_frontier(parsed, robots)
    frontier.write.mode("overwrite").parquet(
        os.path.join(args.output, "frontier")
    )
    n = spark.read.parquet(os.path.join(args.output, "frontier")).count()
    print(f"frontier_hosts={n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
