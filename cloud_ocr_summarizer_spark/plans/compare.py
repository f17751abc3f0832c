"""Local replica of the driver's Spark-vs-DuckDB cross-check.

Compares row count, column-name set, and an order-insensitive multiset of
normalized row values.  Used by tests (sf0.001) and tools/check_oracles.py
(sf0.01, the driver's tier) so oracle drift is caught before the driver
runs.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # absorb last-ulp noise between engines
        return round(v, 6)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # key=repr: rows may mix None with values (e.g. ROLLUP group keys)
    return sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=repr)


def _kind_mismatches(sdf, ddf) -> list[str]:
    """Columns where one engine yields integer dtype and the other float.

    The driver hashes pandas values, and int64(5) hashes differently from
    float64(5.0) — but Python ``==`` (used by our value compare) treats
    them as equal.  DuckDB's HUGEINT (from ``sum(BIGINT)``) lands in
    pandas as float64, which is exactly how the round-3 ``train_split`` /
    ``linestatus_priority_counts`` driver-only hash mismatches slipped
    past the local sweep.  This check makes the sweep strictly stronger
    than the driver on numeric typing.
    """
    bad = []
    for c in sdf.columns:
        if c not in ddf.columns:
            continue
        sk, dk = sdf[c].dtype.kind, ddf[c].dtype.kind
        ints, flts = set("iu"), set("f")
        if (sk in ints and dk in flts) or (sk in flts and dk in ints):
            bad.append(f"{c}: spark={sdf[c].dtype} duck={ddf[c].dtype}")
    return bad


def compare_query(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict[str, Any]:
    sdf = spark_df.toPandas()
    ddf = con.sql(sql).df()
    result: dict[str, Any] = {
        "spark_rows": len(sdf),
        "duck_rows": len(ddf),
        "spark_cols": sorted(sdf.columns),
        "duck_cols": sorted(ddf.columns),
    }
    result["cols_match"] = result["spark_cols"] == result["duck_cols"]
    result["rows_match"] = len(sdf) == len(ddf)
    result["kind_mismatches"] = _kind_mismatches(sdf, ddf)
    if not (result["cols_match"] and result["rows_match"]):
        result["values_match"] = False
        return result
    s_rows = _normalize_rows(list(sdf.columns), [tuple(r) for r in sdf.itertuples(index=False)])
    d_rows = _normalize_rows(list(ddf.columns), [tuple(r) for r in ddf.itertuples(index=False)])
    result["values_match"] = s_rows == d_rows
    if not result["values_match"]:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
        result["first_diffs"] = diffs[:3]
    return result
