#!/usr/bin/env python
"""Run every queries() entry against its DuckDB oracle at a given SF tier —
the same check the driver performs — and print a pass/fail table.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cloud_ocr_summarizer_spark.plans.compare import compare_query, duckdb_connection
from cloud_ocr_summarizer_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # driver parity: a bare session with default configs (the harness
        # does NOT use our session factory)
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark(app_name="check-oracles")
    con = duckdb_connection(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"{name:36s} rows-only ({n} rows)")
            continue
        res = compare_query(fn(spark, sf_dir), con, oracles[name])
        ok = (
            res["cols_match"]
            and res["rows_match"]
            and res["values_match"]
            and not res.get("kind_mismatches")
        )
        status = "OK " if ok else "FAIL"
        print(
            f"{name:36s} {status} spark={res['spark_rows']} duck={res['duck_rows']}"
            + ("" if ok else f" detail={res}")
        )
        if not ok:
            failed.append(name)
    if failed:
        print("FAILED:", failed)
        return 1
    print("all oracle checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
