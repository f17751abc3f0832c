"""Corpus-curation pipeline: the training-data operators composed
end-to-end over a documents table (doc_id, text, ...).

Stages (each DataFrame-native; shuffles only in dedup and the final
partitioned write):

  1. exact dedup        — keep the min-id doc per normalized-text group
  2. near-dup removal   — MinHash+LSH verified pairs; drop the higher id
                          of each pair
  3. quality gate       — quality_score_col >= min_quality basis points
  4. repetition gate    — drop Gopher-flagged degenerate/repetitive docs
  5. language gate      — trigram language ID == lang (None = skip)
  6. split assignment   — hash-bucket train/val/test (80/10/10),
                          leakage-safe (pure function of doc_id)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cloud_ocr_summarizer_spark.functions.hashing import hash_split_col
from cloud_ocr_summarizer_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
)
from cloud_ocr_summarizer_spark.operators.textstats import (
    language_id_scores,
    quality_score_col,
    repetition_profile,
)


def curate_documents(
    docs: DataFrame,
    *,
    min_quality: int = 3000,
    lang: str | None = None,
    neardup_threshold: float = 0.8,
    parallelism: int | None = None,
) -> DataFrame:
    """documents -> curated documents with a ``split`` column."""
    # gate inputs computed from the ORIGINAL docs, not mid-pipeline
    # lineage: flagged/pred_lang are pure per-doc functions, a superset of
    # flagged ids anti-joins to the identical result, and deriving them
    # downstream would re-execute the whole dedup cascade once per gate.
    repetitive = repetition_profile(docs).filter("flagged").select("doc_id")
    lang_pred = (
        None
        if lang is None
        else language_id_scores(docs).select("doc_id", "pred_lang")
    )

    keepers = exact_duplicates(docs).select(F.col("keeper").alias("doc_id"))
    docs = docs.join(keepers, "doc_id", "left_semi")

    pairs = minhash_lsh_pairs(
        docs,
        n=3,
        num_hashes=32,
        bands=8,
        threshold=neardup_threshold,
        parallelism=parallelism,
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")

    docs = docs.filter(quality_score_col(F.col("text")) >= min_quality)

    docs = docs.join(repetitive, "doc_id", "left_anti")

    if lang_pred is not None:
        docs = (
            docs.join(lang_pred, "doc_id")
            .filter(F.col("pred_lang") == lang)
            .drop("pred_lang")
        )

    return docs.withColumn("split", hash_split_col(F.col("doc_id")))
