"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — the byte-pair
-encoding merge-learning loop, as used by GPT-2/SentencePiece-BPE
tokenizer training).

Scale shape — the standard frequency-compressed formulation:

  1. ONE corpus-sized pass: lowercase whitespace wordcount (map-side
     partial agg, one shuffle).  Everything after runs on the DISTINCT
     word table, which is vocabulary-sized (~10^7 rows at web scale),
     not corpus-sized — this is what makes BPE training tractable at
     100 TB.
  2. Per merge round: one row-local pair projection + one weighted
     hash aggregation over the word table + a 1-ROW collect of the
     winning pair (metadata-sized, like the Iceberg snapshot lookup —
     documented exception to the no-collect rule), then a row-local
     merge application.  ``localCheckpoint()`` every round — iterative
     plans that reference their own previous iteration DOUBLE per
     round and OOM the driver by ~round 8 otherwise (the
     duplicate_clusters lesson).

Merge application is a GREEDY LEFT-TO-RIGHT FOLD over the symbol array
(``apply_merge_col``), exactly the reference algorithm: emit merged
when (pending, current) == (left, right), otherwise flush pending.  An
earlier version applied merges as a literal string replace on a
separator-joined representation; that matches ACROSS symbol boundaries
(symbols [ab, c] under merge (b, c) must NOT fuse, but the string
"ab<sep>c" contains "b<sep>c") and no separator placement fixes both
that and the consecutive-run case — the fold is the only correct
primitive, and DuckDB mirrors it with a struct-accumulator
``list_reduce``.

Cross-engine determinism: ties in pair counts break on (count DESC,
left, right) with binary string comparison in both engines.  Words
containing U+001F are dropped up front in BOTH engines — the DuckDB
twin keeps symbols as chr(31)-joined strings between rounds, so the
separator must not occur inside a symbol.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cloud_ocr_summarizer_spark.functions.text import whitespace_tokens_col

SEP = "\x1f"  # U+001F — the oracle's symbol joiner; banned inside words


def word_frequencies(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Lowercase whitespace wordcount: (word, freq).  The single
    corpus-sized stage of BPE training; map-side partial aggregation,
    one shuffle keyed by word."""
    words = df.select(
        F.explode(whitespace_tokens_col(F.lower(F.col(text_col)))).alias("word")
    )
    return (
        words.filter(~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _chars_col(word) -> Column:
    """word -> array of its characters (the initial symbol sequence)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, F.lit(1)),
    )


def apply_merge_col(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of ONE merge to a symbol array:
    scan the symbols, emit ``left+right`` whenever the pending symbol is
    ``left`` and the current one is ``right`` (the merged symbol does
    not re-participate as a left within the same pass), otherwise flush
    the pending symbol — the exact reference-BPE semantics, as a
    row-local fold."""
    merged = left + right

    def step(acc, s):
        flushed = F.when(
            acc["p"].isNotNull(), F.concat(acc["o"], F.array(acc["p"]))
        ).otherwise(acc["o"])
        return F.when(
            acc["p"].isNotNull() & (acc["p"] == left) & (s == right),
            F.struct(
                F.concat(acc["o"], F.array(F.lit(merged))).alias("o"),
                F.lit(None).cast("string").alias("p"),
            ),
        ).otherwise(F.struct(flushed.alias("o"), s.alias("p")))

    return F.aggregate(
        syms,
        F.struct(
            F.array().cast("array<string>").alias("o"),
            F.lit(None).cast("string").alias("p"),
        ),
        step,
        lambda acc: F.when(
            acc["p"].isNotNull(), F.concat(acc["o"], F.array(acc["p"]))
        ).otherwise(acc["o"]),
    )


def train_bpe_merges(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 8,
    min_pair_count: int = 2,
) -> list[dict]:
    """Learn the first ``n_merges`` BPE merges from a documents table.

    Returns the learned merge table as a list of dicts
    ``{rank, left, right, merged, pair_count}`` (rank 1 = first merge).
    Deterministic: ties break (count DESC, left, right).  Stops early
    when no pair reaches ``min_pair_count``.
    """
    freqs = word_frequencies(docs, text_col=text_col)
    syms = freqs.select(
        F.col("freq"), _chars_col(F.col("word")).alias("syms")
    ).localCheckpoint()

    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        # guard: sequence(0, -1) DESCENDS in Spark, so a 1-symbol word
        # would index past the array — emit no pairs for it instead
        pairs = syms.select(
            "freq",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size("syms") - 2),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i.cast("int") + 1).alias("l"),
                            F.element_at(F.col("syms"), i.cast("int") + 2).alias("r"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
            ).alias("_p"),
        )
        top = (
            pairs.groupBy(F.col("_p.l").alias("l"), F.col("_p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_pair_count:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append(
            {"rank": rank, "left": l, "right": r, "merged": l + r, "pair_count": c}
        )
        # localCheckpoint truncates the iterative lineage; the superseded
        # round's blocks are reclaimed by the ContextCleaner (a
        # Dataset-level unpersist() would be a no-op on checkpoint
        # blocks) — acceptable because the word table is vocab-sized
        syms = syms.select(
            "freq", apply_merge_col(F.col("syms"), l, r).alias("syms")
        ).localCheckpoint()
    return merges


def bpe_merges_df(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 8,
    min_pair_count: int = 2,
) -> DataFrame:
    """``train_bpe_merges`` as a DataFrame (rank, left, right, merged,
    pair_count) — the driver-contract surface."""
    spark = docs.sparkSession
    rows = train_bpe_merges(
        docs, text_col=text_col, n_merges=n_merges, min_pair_count=min_pair_count
    )
    return spark.createDataFrame(
        [
            (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
            for m in rows
        ],
        "rank int, left string, right string, merged string, pair_count bigint",
    )


def bpe_encode_col(text, merges: list[dict]):
    """Encode a text column with a LEARNED merge list: per word, apply
    each merge in rank order (the standard greedy BPE encoder), return
    the array of subword tokens.  Row-local — the merge list is baked
    into the expression (it is tokenizer metadata, not data)."""
    words = F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+"),
        lambda w: w != F.lit(""),
    )
    syms = F.transform(words, _chars_col)
    for m in merges:
        left, right = m["left"], m["right"]
        syms = F.transform(syms, lambda sa: apply_merge_col(sa, left, right))
    return F.flatten(syms)
