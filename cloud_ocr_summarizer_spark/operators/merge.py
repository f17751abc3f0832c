"""MERGE / upsert emulation (CDC) without a table format that supports
MERGE INTO natively.

On an Iceberg/Delta deployment these become `MERGE INTO`; the v1
emulation is the classic anti-join + union:

    upsert   : target ⟕anti updates  ∪  updates
    scd2     : close the current row (valid_to = change ts) and append the
               new version (valid_to = null)

Both are pure DataFrame ops — one shuffle on the merge key — and pair
with SnapshotSink so every merge is a committed snapshot (time travel =
read an older snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Rows from ``updates`` win on key collision; everything else kept."""
    kept = target.join(updates.select(key).distinct(), on=key, how="left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    change_ts_col: str = "change_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close current rows touched by
    ``changes`` and append the new versions.

    ``history`` columns: payload + key + valid_from + valid_to (null =
    current).  ``changes`` columns: payload + key + change_ts.
    """
    changed_keys = changes.select(key, F.col(change_ts_col).alias("__ts"))
    closed = (
        history.join(changed_keys, on=key, how="inner")
        .filter(F.col(valid_to).isNull())
        .withColumn(valid_to, F.col("__ts"))
        .drop("__ts")
    )
    untouched_current = history.filter(F.col(valid_to).isNull()).join(
        changed_keys.select(key), on=key, how="left_anti"
    )
    already_closed = history.filter(F.col(valid_to).isNotNull())
    new_rows = changes.withColumnRenamed(change_ts_col, valid_from).withColumn(
        valid_to, F.lit(None).cast(history.schema[valid_to].dataType)
    )
    return (
        already_closed.unionByName(closed)
        .unionByName(untouched_current)
        .unionByName(new_rows.select(*already_closed.columns))
    )
