"""Distinct-count sketching: deterministic KMV (k-minimum-values).

At 100 TB, exact COUNT(DISTINCT) shuffles every distinct key; sketches
cap the per-group state at k values.  HyperLogLog (Spark's
``approx_count_distinct``) is engine-internal and not bit-reproducible
across engines, so for the correctness gate we implement KMV with the
cross-engine md5/31-bit hash family (functions/hashing.py):

    estimate = (k - 1) / (h_(k) / M)

where h_(k) is the k-th smallest distinct hash normalized by
M = 2^31 - 1 (Beyer et al., "On synopses for distinct-value estimation
under multiset operations", SIGMOD'07).  Groups with < k distinct values
report the exact distinct count.

Physical shape — two-level top-k so state is bounded EVERYWHERE:
  1. map-side prune (mapInPandas): each Arrow batch keeps only the k
     smallest distinct hashes per group it contains — output is
     <= k x groups x batches rows, no matter how many distinct values
     exist;
  2. merge: distinct + per-group rank window over the pruned rows (input
     already bounded, so the window partition is small by construction);
  3. one tiny agg per group.
Never a global O(distinct)-rows sort in a single task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from cloud_ocr_summarizer_spark.functions.hashing import M31, md5_hash31_col

__all__ = [
    "kmv_distinct",
    "md5_hash31_col",
    "histogram_quantiles",
    "count_min_sketch",
    "cms_estimate",
    "hll_registers",
    "hll_estimate",
]

_M = M31  # backward-compatible alias


def _batch_prune(k: int):
    """Iterator[pdf(grp,h)] -> per-batch k smallest distinct h per grp."""

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            dedup = pdf.drop_duplicates()
            kept = (
                dedup.sort_values("h")
                .groupby("grp", sort=False, dropna=False)
                .head(k)
                .reset_index(drop=True)
            )
            yield kept

    return prune


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, *, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: (group, n_kept, kth_hash, est_distinct) where est_distinct is
    the KMV estimate rounded to 2 decimals (exact count when the group
    has fewer than k distinct values).  Deterministic: same input ->
    same sketch -> same estimate, on any partitioning and in DuckDB
    (per-batch pruning keeps a superset of each group's k global minima —
    pigeonhole — so the merged result is exactly the unpruned one).
    """
    grp_type = df.schema[group_col].dataType.simpleString()
    hashed = df.select(
        F.col(group_col).alias("grp"),
        md5_hash31_col(F.col(value_col)).alias("h"),
    ).filter(F.col("h").isNotNull())  # null values don't count as distinct
    pruned = hashed.mapInPandas(
        _batch_prune(k), schema=f"grp {grp_type}, h bigint"
    ).dropDuplicates(["grp", "h"])
    w = Window.partitionBy("grp").orderBy("h")
    topk = pruned.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    return (
        topk.groupBy("grp")
        .agg(
            F.count("*").alias("n_kept"),
            F.max("h").alias("kth_hash"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_kept",
            "kth_hash",
            F.round(
                F.when(
                    F.col("n_kept") < k, F.col("n_kept").cast("double")
                ).otherwise((k - 1) / (F.col("kth_hash") / F.lit(float(M31)))),
                2,
            ).alias("est_distinct"),
        )
    )


def histogram_quantiles(
    df: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    n_bins: int = 1024,
) -> DataFrame:
    """Bounded-state quantile estimation: fixed-width histogram sketch.

    Spark's exact ``percentile`` (q_value_quantiles) buffers every value
    of a group in one aggregation buffer — O(group size) memory, the
    kind of state this engine bans at 10^12 rows.  This sketch caps the
    state at n_bins counters per group, is trivially mergeable
    (map-side partial counts combine by addition), and is DETERMINISTIC,
    unlike percentile_approx's merge-order-dependent GK sketch — so the
    DuckDB oracle reproduces it bit-for-bit.

    Estimate: value domain is min/max-scaled into n_bins equal bins
    (one tiny global agg, broadcast back); the q-quantile reports the
    LOWER EDGE of the first bin whose cumulative count reaches
    ceil(q * n) — error bounded by one bin width of the global range.
    All boundary arithmetic is identical IEEE ops on both engines.

    Shape: one shuffle on (group, bin) [state n_bins x groups], a
    per-group cumulative window over <= n_bins rows, one final agg.
    """
    span = F.col("_mx") - F.col("_mn")
    denom = F.greatest(span, F.lit(1e-9))
    stats = df.agg(
        F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
    )
    binned = df.crossJoin(F.broadcast(stats)).select(
        F.col(group_col).alias("grp"),
        F.least(
            F.floor((F.col(value_col) - F.col("_mn")) * n_bins / denom),
            F.lit(n_bins - 1),
        )
        .cast("int")
        .alias("bin"),
    )
    counts = binned.groupBy("grp", "bin").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("grp")
    cum = counts.select(
        "grp",
        "bin",
        F.sum("c").over(w_cum).alias("cumc"),
        F.sum("c").over(w_all).alias("n"),
    )
    edge = lambda b: F.round(  # noqa: E731
        F.col("_mn") + b * (F.col("_mx") - F.col("_mn")) / n_bins, 4
    )
    aggs = [F.max("n").alias("n")]
    for q in quantiles:
        target = F.ceil(F.lit(q) * F.col("n"))
        b = F.min(F.when(F.col("cumc") >= target, F.col("bin")))
        aggs.append(edge(b).alias(f"p{round(q * 100)}_est"))
    return (
        cum.crossJoin(F.broadcast(stats))
        .groupBy(F.col("grp").alias(group_col), "_mn", "_mx")
        .agg(*aggs)
        .drop("_mn", "_mx")
    )


def count_min_sketch(
    df: DataFrame,
    *,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over a column:
    ``depth`` salted hash rows x ``width`` counters, returned as the
    materialized sketch table (row, col, count) — integer end to end,
    so the DuckDB twin reproduces it bit-exactly.

    Point estimates are min over the d counters a value hashes to —
    always an OVERestimate, never under (see tests).

    NULL values are excluded (same contract as ``kmv_distinct``) — a
    NULL would hash to a NULL cell that no probe's equi-join could ever
    match, silently vanishing from every estimate.

    Scale: one projection fanning each input row into ``depth`` (row,
    col) pairs + one hash aggregation whose output is bounded at
    depth x width rows REGARDLESS of corpus size (map-side partial agg
    collapses the stream long before the exchange)."""
    salted = F.explode(_cms_cells(F.col(value_col), depth, width))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(salted.alias("_rc"))
        .groupBy(F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _cms_cells(value: Column, depth: int, width: int) -> Column:
    """The (row, col) counter cells a value hashes to — the ONE salted
    hash layout shared by sketch construction and point estimation, so
    the two cannot drift (pass the SAME depth/width to both: a probe
    hashed with a different width silently misses every counter)."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.pmod(
                    md5_hash31_col(
                        F.concat(F.lit(f"cms{j}:"), value.cast("string"))
                    ),
                    F.lit(width),
                ).cast("int").alias("col"),
            )
            for j in range(depth)
        ]
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, *, value_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-estimate each probe value against a materialized sketch:
    min over the depth counters it hashes to (missing counter = 0).
    ``depth``/``width`` MUST match the sketch's (shared ``_cms_cells``
    layout).  Broadcast the sketch (depth x width rows,
    corpus-independent)."""
    probe_cells = probes.select(
        F.col(value_col),
        F.explode(_cms_cells(F.col(value_col), depth, width)).alias("_rc"),
    ).select(value_col, F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col"))
    joined = probe_cells.join(F.broadcast(sketch), ["row", "col"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("count"), F.lit(0))).alias("estimate")
    )


def hll_registers(
    df: DataFrame, *, value_col: str, b: int = 6
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007) with the
    cross-engine md5/31-bit hash family: register = h mod 2^b, and
    rho = leading-zero count of the remaining (31-b)-bit word plus one
    — computed as (31-b) - len(bin(w)) + 1, INTEGER in both engines
    (Spark ``bin`` and DuckDB ``bin`` both render without leading
    zeros).  Returns (register, max_rho) for registers that saw at
    least one value; the estimate itself involves float harmonic means
    whose summation order is engine-dependent, so the value-checked
    surface is the integer register table and the estimate lives in
    operator code / tests (``hll_estimate``).  NULL values are excluded
    (the ``kmv_distinct`` contract) — otherwise a bogus NULL-register
    row would leak into ``hll_estimate``'s zero-register count."""
    df = df.filter(F.col(value_col).isNotNull())
    h = md5_hash31_col(F.col(value_col))
    reg = F.pmod(h, F.lit(2**b)).cast("int")
    w = (h / F.lit(2**b)).cast("bigint")  # == h >> b, h is non-negative
    rho = (
        F.when(w > 0, F.lit(31 - b) - F.length(F.bin(w)) + 1)
        .otherwise(F.lit(31 - b + 1))
        .cast("int")
    )
    return (
        df.select(reg.alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: list[tuple[int, int]], *, b: int = 6) -> float:
    """Driver-side HLL estimate from a collected register table (the
    table is at most 2^b rows — metadata-sized).  Standard bias-corrected
    formula with linear counting for the small range."""
    import math

    m = 2**b
    got = dict(registers)
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    s = sum(2.0 ** -got.get(r, 0) for r in range(m))
    est = alpha * m * m / s
    zeros = m - len(got)
    if est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return est
