"""The cross-engine (md5/31-bit) hash family — single source of truth.

Every operator whose DuckDB oracle must reproduce hashing bit-exactly
(checked MinHash/SimHash dedup, KMV sketches, train/val/test splits)
derives from THIS function and THIS modulus; the SQL twin is
``('0x' || substr(md5(v), 1, 14))::BIGINT % 2147483647``.  Changing the
family here without updating plans/oracles.py breaks engine/oracle
parity for all of them at once — which is the point: one place to break
loudly instead of three places to drift silently.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

M31 = 2147483647  # 2^31 - 1


def md5_hash31_col(value: Column) -> Column:
    """31-bit hash: ('0x' || md5(cast(v as string))[:14])::BIGINT % (2^31-1)."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(value.cast("string").cast("binary")), 1, 14), 16, 10
        ).cast("bigint"),
        F.lit(M31),
    )


def hash_split_col(
    id_col: Column,
    *,
    buckets: tuple[tuple[str, int], ...] = (("train", 80), ("val", 90)),
    default: str = "test",
) -> Column:
    """Leakage-safe corpus split: bucket = hash(id) % 100, assigned by the
    first (name, upper_bound) whose bound exceeds it — a pure function of
    the id, stable across runs, partitionings, and engines."""
    bucket = F.pmod(md5_hash31_col(id_col), F.lit(100))
    expr = None
    for name, upper in buckets:
        branch = F.when(bucket < upper, name)
        expr = branch if expr is None else expr.when(bucket < upper, name)
    return expr.otherwise(default)
