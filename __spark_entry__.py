"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator for the driver's DuckDB
cross-check (row count + schema + order-insensitive value hash at sf0.01).
Implementation lives in cloud_ocr_summarizer_spark/ — this module is only
the wiring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession

from cloud_ocr_summarizer_spark.plans import oracles as _oracles
from cloud_ocr_summarizer_spark.plans import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    documents -> deterministic interleaved (doc_id, spans) -> row-local
    extraction (classify + assemble + offset-order) -> flat span rows.
    """
    return _queries.q_extract_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(_queries.BATCH_1)
    for extra in ("BATCH_2", "BATCH_3", "BATCH_4", "BATCH_5", "BATCH_6", "BATCH_UDF"):
        out.update(getattr(_queries, extra, {}))
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(_oracles.ORACLES)
