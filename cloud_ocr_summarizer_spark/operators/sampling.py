"""Deterministic corpus sampling and sequence packing for training-data
pipelines.

* ``hash_sample``   — leakage-safe (per-)stratum sampling: membership is a
                      pure function of the doc id (cross-engine md5/31-bit
                      family), never a PRNG — reproducible across runs,
                      partitionings, and engines, and composable with the
                      train/val/test split (functions/hashing.hash_split_col)
                      because the two use different hash salts.
* ``pack_sequences``— token-budget bin packing (the pretraining "sequence
                      packing" step): docs are packed contiguously into
                      fixed-budget bins in a deterministic hash order.
                      Packing is inherently order-dependent, so the order
                      IS the spec: docs are bucketed by id hash (so the
                      window never funnels the corpus through one task)
                      and packed by running token count within each
                      bucket — one shuffle, scale-safe, SQL-expressible.

Both are row-local except the packing window's single (bucket) shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from cloud_ocr_summarizer_spark.functions.hashing import M31, md5_hash31_col


def hash_sample(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    fraction: float | None = None,
    stratum_col: str | None = None,
    fractions: dict[str, float] | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Keep each row iff hash(salt, id) % 10^6 < fraction * 10^6.

    With ``stratum_col`` + ``fractions`` the rate varies per stratum
    (data-mixing: e.g. {"web": 0.1, "code": 1.0}); strata missing from
    the dict are dropped (rate 0).  Deterministic and engine-stable —
    the DuckDB oracle reproduces membership row for row.  Row-local:
    no shuffle, no PRNG, no driver state.
    """
    bucket = F.pmod(
        md5_hash31_col(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        F.lit(1_000_000),
    )
    # round, don't truncate: int(0.29 * 1e6) is 289999 (binary float), a
    # silent off-by-one vs any decimal-arithmetic SQL mirror of the rate
    to_thr = lambda frac: F.lit(int(round(frac * 1_000_000)))  # noqa: E731
    if fractions is not None:
        if stratum_col is None:
            raise ValueError("fractions requires stratum_col")
        # {} would leave the when-chain empty (rate=None -> AttributeError);
        # the documented "missing strata are dropped" contract makes the
        # all-drop intent of {} ambiguous enough to reject loudly instead.
        if not fractions:
            raise ValueError("fractions must name at least one stratum")
        rate = None
        for name, frac in fractions.items():
            branch = F.when(F.col(stratum_col) == name, to_thr(frac))
            rate = branch if rate is None else rate.when(
                F.col(stratum_col) == name, to_thr(frac)
            )
        rate = rate.otherwise(F.lit(0))
    elif fraction is not None:
        rate = to_thr(fraction)
    else:
        raise ValueError("pass fraction or fractions")
    return df.filter(bucket < rate)


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 1024,
) -> DataFrame:
    """Assign each doc to a (bucket, bin) so every bin's token total is
    <= ``budget`` + one overflowing doc (contiguous-fill packing).

    Deterministic spec: doc order within a bucket is (id hash, id); a
    doc's bin is floor((running_total - own_tokens) / budget) — the
    standard greedy fill where a doc that crosses the boundary starts
    in the bin its fill position dictates.  ``n_buckets`` bounds window
    state per task (corpus/n_buckets docs); raise it with corpus size.
    One shuffle on bucket.  Output: (doc_id, bucket, bin_id, fill_pos,
    n_tokens).
    """
    h = md5_hash31_col(F.concat(F.lit("pack:"), F.col(id_col).cast("string")))
    bucketed = df.select(
        F.col(id_col),
        F.col(tokens_col).alias("n_tokens"),
        F.pmod(h, F.lit(n_buckets)).cast("int").alias("bucket"),
        h.alias("_h"),
    )
    w = Window.partitionBy("bucket").orderBy("_h", id_col)
    cum = F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return bucketed.select(
        id_col,
        "bucket",
        F.floor((cum - F.col("n_tokens")) / F.lit(budget)).cast("int").alias("bin_id"),
        (cum - F.col("n_tokens")).cast("long").alias("fill_pos"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


def chunk_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping fixed-token context windows.

    The complement of :func:`pack_sequences`: packing fills a token
    budget with whole SHORT documents; chunking SPLITS a long document
    into training windows of ``chunk_tokens`` whitespace tokens whose
    starts advance by ``stride`` (overlap = chunk_tokens - stride keeps
    boundary context in two windows, the standard pretraining treatment
    of >context-length docs).

    Chunk count: 1 when n <= chunk_tokens, else
    1 + ceil((n - chunk_tokens) / stride) — full coverage, every token
    in >=1 chunk, last chunk length in (chunk_tokens - stride,
    chunk_tokens].  All integer arithmetic.

    Scale: tokenize + sequence + posexplode + slice, all JVM expressions
    inside one codegen stage; zero shuffles, zero Python.  Output rows
    ~= corpus_tokens / stride — linear in input bytes regardless of how
    skewed individual document lengths are (a 1 GB document becomes
    ~300k independent rows, not one straggler task's private problem).
    """
    if stride <= 0 or chunk_tokens <= 0 or stride > chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    # null-coalesced like every tokenizer in the package: a NULL-text
    # doc must yield its one empty chunk row, not silently vanish
    # (split(NULL) -> NULL -> posexplode drops the doc)
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"), lambda w: w != ""
    )
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        (F.lit(1) + F.floor((n - chunk_tokens + stride - 1) / stride)).cast("int")
    )
    base = docs.select(
        "doc_id",
        toks.alias("_toks"),
        n.alias("n_tokens"),
        n_chunks.alias("n_chunks"),
    )
    start = F.col("chunk_id") * stride  # 0-based token start
    return base.select(
        "doc_id",
        "n_tokens",
        "n_chunks",
        F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
            "chunk_id", "_i"
        ),
        "_toks",
    ).select(
        "doc_id",
        "chunk_id",
        "n_chunks",
        F.least(F.lit(chunk_tokens), F.col("n_tokens") - start)
        .cast("int")
        .alias("chunk_len"),
        F.array_join(
            F.slice(F.col("_toks"), start + 1, chunk_tokens), " "
        ).alias("chunk_text"),
    )


def cap_per_source(
    docs: DataFrame,
    *,
    cap: int,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Domain balancing (RefinedWeb-style per-source cap): keep at most
    ``cap`` documents per source, chosen by the deterministic md5/31-bit
    hash rank of the id — a pure function of the data, stable across
    runs, partitionings, and engines (no PRNG).

    Output adds ``source_rank`` (1-based rank within the source) so the
    caller can audit how deep each source ran; over-cap docs are
    DROPPED — pair with a groupBy(source) count on the input when drop
    observability is needed (the cap-audit pattern of operators/dedup).

    Scale shape: one hash-partitioned window per source.  Source
    cardinality is the parallelism bound — for web corpora (millions of
    domains) the window keys are plentiful; a single mega-source is the
    pathological case and is exactly what the cap truncates."""
    w = Window.partitionBy(source_col).orderBy(
        md5_hash31_col(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("source_rank", F.row_number().over(w))
        .filter(F.col("source_rank") <= cap)
    )


__all__ = [
    "hash_sample",
    "pack_sequences",
    "chunk_documents",
    "cap_per_source",
    "temperature_mix",
    "M31",
]


def temperature_mix(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    stratum_col: str = "source",
    alpha: float = 0.3,
    target_frac: float = 0.5,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-based source re-balancing (the multilingual-sampling
    rule popularized by mBERT/XLM-R and unified in Chung et al. 2023:
    target share p_i proportional to n_i ** alpha).  alpha < 1 flattens
    the source distribution — small sources are upsampled toward
    keep-everything, dominant sources are downsampled — while the total
    kept volume lands near ``target_frac`` of the corpus.

      keep_rate_i = min(1, target_frac * N * p_i / n_i),
      p_i = n_i**alpha / sum_j n_j**alpha

    Membership is the same deterministic hash-threshold family as
    ``hash_sample`` (salted md5/31-bit vs a ppm rate), never a PRNG.
    The rate here is quantized floor(x + 0.5) identically on both
    engines (hash_sample's caller-supplied rates use Python round(),
    half-to-even — a different rule exactly at .5 ppm; the two samplers
    share the hash family, not the quantizer).  The residual
    cross-engine risk is pow() ulp noise moving a rate across a ppm
    boundary — ~1e-11 absolute on a ~1e5-magnitude value, negligible
    and absorbed by the round-half-up quantization.

    A NULL stratum is a stratum like any other (the rate join is
    null-safe) — NULL-source docs are rated and sampled, not silently
    dropped while still inflating everyone else's denominators.

    Scale: one per-stratum count aggregation (|strata| rows, map-side
    partial), a 1-row totals cross join onto it, and a BROADCAST join of
    the |strata|-row rate table back to the corpus — the corpus itself
    never shuffles.  Output: kept rows of ``df`` plus ``rate_ppm``.
    """
    if not 0 < target_frac <= 1:
        raise ValueError("target_frac must be in (0, 1]")
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    totals = counts.agg(
        F.sum("_n").alias("_tot"),
        F.sum(F.pow(F.col("_n").cast("double"), F.lit(alpha))).alias("_wsum"),
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        F.col(stratum_col),
        F.least(
            F.lit(1_000_000),
            F.floor(
                F.lit(1_000_000.0 * target_frac)
                * F.col("_tot")
                * F.pow(F.col("_n").cast("double"), F.lit(alpha))
                / (F.col("_wsum") * F.col("_n"))
                + F.lit(0.5)
            ),
        )
        .cast("int")
        .alias("rate_ppm"),
    )
    rates = rates.withColumnRenamed(stratum_col, "_rate_stratum")
    bucket = F.pmod(
        md5_hash31_col(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        F.lit(1_000_000),
    )
    return (
        df.join(
            F.broadcast(rates),
            F.col(stratum_col).eqNullSafe(F.col("_rate_stratum")),
        )
        .drop("_rate_stratum")
        .filter(bucket < F.col("rate_ppm"))
    )
