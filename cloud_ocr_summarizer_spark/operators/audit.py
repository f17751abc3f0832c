"""Shared one-row cap-drop audit schema.

Every silent cap in the engine reports
``(cap_name, cap_value, dropped_groups, dropped_rows)`` — the contract
the dedup audit family established (``dedup.py``'s
``*_drop_audit``/``_cap_drop_summary``; ADVICE r2: silence is the
failure mode being fixed, so a cap that never fires still yields an
explicit zero row).  This helper pins the schema and column types in
ONE place so new audits cannot drift from each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column


def cap_drop_audit_row(
    over: DataFrame, *, cap_name: str, cap_value: int, dropped_rows: Column
) -> DataFrame:
    """Over-cap group frame -> ONE audit row.

    ``over`` carries one row per group the cap truncates (already
    filtered/anti-joined by the caller); ``dropped_rows`` is the
    per-group count of member rows the cap cut.  A global aggregate
    over an empty frame still returns one row: ``count(*)`` is 0 (never
    NULL) and the ``sum`` is NULL — coalesced to an explicit zero.
    Types are pinned: cap_value int, both counts bigint (the
    cross-engine hash compares dtypes)."""
    return over.agg(
        F.lit(cap_name).alias("cap_name"),
        F.lit(cap_value).cast("int").alias("cap_value"),
        F.count("*").cast("bigint").alias("dropped_groups"),
        F.coalesce(F.sum(dropped_rows), F.lit(0))
        .cast("bigint")
        .alias("dropped_rows"),
    )
