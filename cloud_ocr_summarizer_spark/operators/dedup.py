"""Deduplication operators for large-scale corpus curation.

Four tiers, cheapest first — all built so the expensive pairwise work only
ever happens inside small candidate buckets, never across the full corpus
(at 10^12 docs a global cross-join is off the table):

* ``exact_duplicates``      — hash-groupBy on normalized text (1 shuffle).
* ``ngram_jaccard_pairs``   — word n-gram Jaccard for candidate pairs that
                              share a gram within a blocking key.
* ``minhash_lsh_pairs``     — MinHash signatures + banded LSH: row-local
                              signature computation, one shuffle per band
                              bucket join, exact-Jaccard verification only
                              inside buckets.
* ``simhash_buckets``       — 64-bit SimHash fingerprint; near-dup pairs by
                              Hamming distance within prefix buckets.

All hashing is xxhash64 (seed-stable Spark built-in) so results are
deterministic across runs/partitionings; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cloud_ocr_summarizer_spark.functions.text import (
    normalize_block_text_col,
    whitespace_tokens_col,
)


def word_ngrams_col(text: Column, n: int) -> Column:
    """Distinct word n-grams of a text column, row-local."""
    words = whitespace_tokens_col(text)
    n_words = F.size(words)
    grams = F.when(
        n_words >= n,
        F.transform(
            F.sequence(F.lit(0), n_words - n),
            lambda i: F.array_join(F.slice(words, i.cast("int") + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: group by md5 of normalized text; keeper = min id.

    One shuffle on the hash; at scale the md5 is computed map-side and the
    groupBy benefits from partial aggregation.
    """
    normalized = normalize_block_text_col(F.col(text_col))
    hashed = df.select(
        F.col(id_col), F.md5(normalized.cast("binary")).alias("text_hash")
    )
    return hashed.groupBy("text_hash").agg(
        F.count("*").alias("n_docs"),
        F.min(id_col).alias("keeper"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard for candidate pairs sharing >=1 gram
    (optionally within a blocking column to bound the candidate set).

    Output: (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    intersection via gram-join counts; union = |A| + |B| - inter.
    """
    grams = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
        F.explode(word_ngrams_col(F.col(text_col), n)).alias("gram"),
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    join_keys = ["gram"] + (["blk"] if block_col else [])
    b = grams
    pairs = (
        grams.alias("a")
        .join(b.alias("b"), on=join_keys)
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pairs.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter")
                / (F.col("sa.n_grams") + F.col("sb.n_grams") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature_col(text: Column, *, n: int, num_hashes: int) -> Column:
    """Row-local MinHash signature: for hash seed h, min over grams of
    xxhash64(h, gram).  array<long> of length num_hashes."""
    grams = word_ngrams_col(text, n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda h: F.array_min(F.transform(grams, lambda g: F.xxhash64(h, g))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidates, verified with exact Jaccard.

    Pipeline shape (scale-first):
      1. row-local: grams -> signature (num_hashes mins) -> band hashes;
      2. explode band index (xB rows), shuffle ONCE on (band, band_hash);
      3. pairs within buckets only (self-join inside tiny groups);
      4. exact-Jaccard verification re-using the gram arrays, only for
         candidate pairs (broadcast-friendly at bucket scale).

    Signatures with empty gram sets (docs shorter than n words) are dropped.
    Output: (id_a, id_b, jaccard) with jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    grams = word_ngrams_col(F.col(text_col), n)
    base = df.select(F.col(id_col).alias("id"), grams.alias("grams")).filter(
        F.size("grams") > 0
    )
    sig = base.withColumn(
        "sig",
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda h: F.array_min(F.transform(F.col("grams"), lambda g: F.xxhash64(h, g))),
        ),
    )
    banded = sig.select(
        "id",
        "grams",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.xxhash64(
                        F.slice(F.col("sig"), b.cast("int") * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "grams", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.grams").alias("grams_a"),
            F.col("b.grams").alias("grams_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    return (
        cand.select(
            "id_a",
            "id_b",
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_col(text: Column, *, bits: int = 64) -> Column:
    """Row-local 64-bit SimHash over word tokens: for each bit position,
    sign of the sum over tokens of (+1 if hash bit set else -1)."""
    words = whitespace_tokens_col(text)
    hashes = F.transform(words, lambda w: F.xxhash64(w))

    def bit_col(b: int) -> Column:
        # shift amount must be a literal; loop bits in Python (static expr)
        return (
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1),
            )
            > 0
        ).cast("int")

    return F.array(*[bit_col(b) for b in range(bits)])


def simhash_fingerprints(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash bit array).  Near-dup pairs = small Hamming distance."""
    bits = simhash_col(F.col(text_col))
    return df.select(F.col(id_col).alias("id"), bits.alias("bits"))


def simhash_near_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, banded-LSH style.

    The 64 bits split into ``bands`` blocks; a pair is a candidate if ANY
    block matches exactly (pigeonhole: hamming <= bands-1 guarantees a
    match; up to max_hamming found with high recall).  One shuffle on
    (band, block-bucket); exact Hamming verified inside buckets only.
    Output: (id_a, id_b, hamming) with hamming <= max_hamming.
    """
    fp = simhash_fingerprints(df, id_col=id_col, text_col=text_col)
    block = 64 // bands
    banded = fp.select(
        "id",
        "bits",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.aggregate(
                        F.slice(F.col("bits"), b.cast("int") * block + 1, block),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc * 2 + x,
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bits", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.aggregate(
        F.zip_with(F.col("a.bits"), F.col("b.bits"), lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
