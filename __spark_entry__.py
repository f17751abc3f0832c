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

_PKG_ZIP: str | None = None


def _ship_package(spark: SparkSession) -> None:
    """Make cloud_ocr_summarizer_spark importable in Python WORKERS.

    Pandas/Arrow UDF closures reference module-level functions, which
    cloudpickle serializes by module name — so workers must import the
    package.  When the harness's driver process was not launched from the
    repo root, worker PYTHONPATH doesn't include it and every
    mapInPandas/mapInArrow stage dies with ModuleNotFoundError.  Shipping
    a zip via addPyFile fixes this for any session, local or clustered
    (the spark-submit jobs do the same thing with --py-files).
    """
    if getattr(spark, "_cos_pkg_shipped", False):
        return
    import shutil
    import tempfile

    try:
        sc = spark.sparkContext
    except Exception:
        # Spark Connect sessions have no sparkContext; there the classic
        # cwd/PYTHONPATH route is the only option — don't break the
        # contract for the row-local queries that need no worker import.
        spark._cos_pkg_shipped = True  # type: ignore[attr-defined]
        return
    try:
        global _PKG_ZIP
        if _PKG_ZIP is None:
            # fresh private dir per process: never reuses a stale or
            # half-written zip left by another (possibly pid-recycled)
            # process in /tmp
            base = os.path.join(tempfile.mkdtemp(prefix="cos_spark_pkg_"), "pkg")
            _PKG_ZIP = shutil.make_archive(
                base, "zip", root_dir=_REPO_ROOT, base_dir="cloud_ocr_summarizer_spark"
            )
        sc.addPyFile(_PKG_ZIP)
    except Exception as exc:
        # A real shipping failure (full/unwritable TMPDIR, addPyFile
        # refusal) stays audible — a later worker ModuleNotFoundError
        # needs this warning to point at the cause.
        import warnings

        warnings.warn(
            "could not ship cloud_ocr_summarizer_spark to workers "
            f"({type(exc).__name__}: {exc}); pandas/Arrow UDF stages "
            "will require the package on worker PYTHONPATH",
            RuntimeWarning,
            stacklevel=2,
        )
    spark._cos_pkg_shipped = True  # type: ignore[attr-defined]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    documents -> deterministic interleaved (doc_id, spans) -> row-local
    extraction (classify + assemble + offset-order) -> flat span rows.
    """
    _ship_package(spark)
    return _queries.q_extract_flagship(spark, "/root/testdata/sf0.001")


def _with_shipped(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Batch order rotates per round so that EVERY query eventually gets a
    value-checked row in a committed CORRECTNESS_r*.json, not just a
    fixed prefix (the sweep checks a bounded number per round).  Rounds
    1-2 banked green rows for BATCH_1/UDF/2/3/4 and most of BATCH_5;
    round 3 leads with the never-yet-checked queries — BATCH_6 (the
    curation/relational additions) and BATCH_5's tail — per VERDICT r2
    item 1.  The full map is identical either way; tests/check_oracles
    cover all entries every round regardless of order.
    """
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for batch in (
        "BATCH_1",
        "BATCH_UDF",
        "BATCH_2",
        "BATCH_3",
        "BATCH_4",
        "BATCH_5",
        "BATCH_6",
        "BATCH_7",
        "BATCH_8",
        "BATCH_9",
    ):
        out.update(getattr(_queries, batch, {}))
    out.setdefault("events_daily", _queries.q_events_daily)
    ordered = _rotate_never_checked_first(out)
    return {name: _with_shipped(ordered[name]) for name in ordered}


def _rotate_never_checked_first(qmap: dict) -> dict:
    """Order the map so never-driver-green queries come first.

    Self-maintaining rotation: the committed CORRECTNESS_r*.json files
    record which queries the driver has value-checked green in any past
    round.  Queries without a green row (never in a window, or red) lead;
    already-banked greens follow in canonical batch order.  If the
    snapshots are unreadable (e.g. the contract module was copied out of
    the repo), the canonical order stands — every entry is still present
    either way, and tools/check_oracles.py covers all of them each round.
    """
    green: set[str] = set()
    try:
        import glob
        import json

        for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
            with open(path) as fh:
                for name, row in json.load(fh).items():
                    value_green = (
                        row.get("rows_match")
                        and row.get("schema_match")
                        and row.get("hash_match", True)
                    )
                    # rows-only-by-design queries bank their (weaker)
                    # rows-only row the first time the driver records it
                    rows_only_recorded = (
                        row.get("err") == "no_oracle"
                        and (row.get("spark_rows") or 0) > 0
                    )
                    if value_green or rows_only_recorded:
                        green.add(name)
    except Exception:
        return dict(qmap)
    fresh = {k: v for k, v in qmap.items() if k not in green}
    banked = {k: v for k, v in qmap.items() if k in green}
    return {**fresh, **banked}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(_oracles.ORACLES)
