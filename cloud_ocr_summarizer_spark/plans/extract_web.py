"""Composed web-document extraction: the north-rule pipeline as ONE job.

The target workload is "batched DOM tokenization and boilerplate
classification + PDF/image layout parsing for media_ref spans + per-span
kind tagging" over interleaved text+media documents.  The individual
operators each have their own driver query; this plan composes them the
way a user runs them — one call, one output row per document:

  doc_id, main_text, n_tokens          (DOM boilerplate strip)
  n_spans, n_media                     (span extraction + kind tagging)
  n_blocks, first_block                (layout parse, reading order)

Plan shape at scale: two branches over the same documents scan —

* the SPAN branch is entirely row-local (extract_spans + the layout
  fold + media counting never shuffle; one codegen stage per doc), and
* the DOM branch is one Arrow-batched map stage —

joined 1:1 on doc_id: a single O(docs) equi-join is the only shuffle in
the whole pipeline.  Nothing per-row Python outside the DOM tokenizer's
Arrow batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_ocr_summarizer_spark.datagen import (
    derive_html_from_documents,
    derive_spans_from_documents,
)
from cloud_ocr_summarizer_spark.operators.dom import extract_html_main
from cloud_ocr_summarizer_spark.operators.extract import extract_spans
from cloud_ocr_summarizer_spark.operators.layout import blocks_rowlocal_col


def extract_web_documents(docs: DataFrame) -> DataFrame:
    """One row per document combining DOM strip, span stats, and layout.

    ``docs`` is the documents table (doc_id, text, source, ...); the
    deterministic HTML/spans derivers stand in for raw crawl payloads,
    exactly as in the single-operator queries (so each branch keeps its
    independent oracle coverage).
    """
    dom = extract_html_main(derive_html_from_documents(docs))

    blocks = blocks_rowlocal_col("spans_out")
    span_branch = extract_spans(
        derive_spans_from_documents(docs), with_stats=False
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size("spans_out").cast("int").alias("n_spans"),
        F.size(
            F.filter(F.col("spans_out"), lambda s: s["media_ref"].isNotNull())
        ).cast("int").alias("n_media"),
        F.size(blocks).cast("int").alias("n_blocks"),
        F.element_at(blocks, 1)["block_text"].alias("first_block"),
    )
    return dom.join(span_branch, "doc_id")
