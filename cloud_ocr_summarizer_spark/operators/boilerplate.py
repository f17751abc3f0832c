"""Cross-document boilerplate span removal by corpus frequency.

The reference classifies each document in isolation — per-span kind
tagging and in-document text/link-density heuristics
(/root/reference/src/processors/vision_processor.py:226-402) have no
corpus-level view.  Web-extraction pipelines add exactly that second
signal (CCNet / RefinedWeb line-dedup): a text span whose normalized
content recurs across many documents OF THE SAME SOURCE (nav bars,
footers, cookie banners) is boilerplate no matter how "texty" it looks
locally.  This module is that corpus-frequency pass over the interleaved
(doc_id, spans, source) table.

Scale design (the 100 TB story):

* pass 1 — dictionary build (``boilerplate_dictionary``): explode text
  spans to (source, fp, doc_id) where fp = md5(lower(trim(text))); one
  DISTINCT-then-count agg shuffle of ~50-byte key rows with map-side
  partial aggregation.  Only fingerprints seen in >= ``min_df`` distinct
  docs survive; they are ranked per source by (df desc, fp) and capped
  at ``max_dict`` — the per-source window only ever sees repeated
  fingerprints, a set that is tiny relative to the corpus.  The capped
  tail is observable via ``boilerplate_drop_audit`` (repo rule: caps
  never fire silently).
* pass 2 — removal (``remove_boilerplate_spans``): the dictionary is
  collapsed to ONE ROW PER SOURCE (sorted fp array) and broadcast, so
  removal is a row-local higher-order ``filter`` over each doc's spans
  array — the corpus is never exploded, never shuffled, and span order
  survives inside the array, so seq renumbering is a row-local
  posexplode.  ``array_contains`` is O(|dict|) per span; at ~1e5 fps
  per source swap the array for a map literal or a bloom filter — the
  broadcast stays O(distinct boilerplate), independent of corpus size.

Media spans always pass through: only kind=TEXT spans carry content a
frequency dictionary can match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from cloud_ocr_summarizer_spark import config


def _span_fingerprint(text_col: Column) -> Column:
    """md5 of the case/edge-whitespace-normalized span text.  Full 128-bit
    hex: a 31-bit fingerprint would birthday-collide at web scale and
    silently mark innocent spans boilerplate."""
    return F.md5(F.lower(F.trim(text_col)))


def boilerplate_dictionary(
    spans_src: DataFrame, *, min_df: int = 2
) -> DataFrame:
    """(doc_id, spans, source) -> (source, fp, df, rk): fingerprints of
    text spans seen in >= min_df DISTINCT docs of one source, ranked by
    (df desc, fp asc).  Within-doc repeats count once — a doc that
    repeats its own header is repetition (gopher_repetition's job), not
    cross-document boilerplate."""
    ex = spans_src.select(
        "doc_id", "source", F.explode("spans").alias("s")
    ).filter(
        # NULL-text spans have no fingerprint: without this filter a
        # NULL fp group could consume a rank slot (NULLS FIRST among
        # equal df) and desync removal from the oracle's text IS NOT
        # NULL contract under a binding max_dict cap
        (F.col("s.kind") == config.KIND_TEXT) & F.col("s.text").isNotNull()
    )
    per_doc = ex.select(
        "source", _span_fingerprint(F.col("s.text")).alias("fp"), "doc_id"
    ).distinct()
    dfreq = per_doc.groupBy("source", "fp").agg(F.count("*").alias("df"))
    w = Window.partitionBy("source").orderBy(F.col("df").desc(), F.col("fp").asc())
    return (
        dfreq.filter(F.col("df") >= F.lit(min_df))
        .withColumn("rk", F.row_number().over(w).cast("int"))
    )


def remove_boilerplate_spans(
    spans_src: DataFrame, *, min_df: int = 2, max_dict: int = 100_000
) -> DataFrame:
    """Drop boilerplate text spans, keep order, renumber seq.

    Output: flat (doc_id, seq, kind, text, media_ref, offset) rows over
    the surviving spans, seq = 1..n in offset order per doc; docs whose
    spans are all boilerplate emit no rows.  The original ``offset``
    column is retained so the pre-removal position stays joinable.
    """
    dic = boilerplate_dictionary(spans_src, min_df=min_df).filter(
        F.col("rk") <= F.lit(max_dict)
    )
    per_source = dic.groupBy("source").agg(
        F.sort_array(F.collect_list("fp")).alias("_boiler")
    )
    joined = spans_src.join(F.broadcast(per_source), "source", "left")
    boiler = F.coalesce(F.col("_boiler"), F.array().cast("array<string>"))
    # offset-first re-wrap so sort_array orders by offset (struct order is
    # field-by-field), making offset order a contract rather than trusting
    # upstream array construction — same trick as extract._canonical_struct
    ordered = F.sort_array(
        F.transform(
            F.col("spans"),
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    # coalesce: a TEXT span with NULL text hashes to NULL -> array_contains
    # NULL -> the predicate would go NULL and filter() would drop the span;
    # P7 null tolerance says unmatched means kept
    kept = F.filter(
        ordered,
        lambda s: ~F.coalesce(
            (s["kind"] == F.lit(config.KIND_TEXT))
            & F.array_contains(boiler, _span_fingerprint(s["text"])),
            F.lit(False),
        ),
    )
    return (
        joined.select("doc_id", F.posexplode(kept).alias("pos", "s"))
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("int").alias("seq"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
        )
    )


def boilerplate_drop_audit(
    spans_src: DataFrame, *, min_df: int = 2, max_dict: int = 100_000
) -> DataFrame:
    """ONE row (cap_name, cap_value, dropped_groups, dropped_rows): how
    many over-cap dictionary fingerprints the ``max_dict`` rank cap cut
    and how many doc memberships (df sum) they carried.  Explicit zero
    row when the cap never fires — same contract as the dedup audits."""
    over = boilerplate_dictionary(spans_src, min_df=min_df).filter(
        F.col("rk") > F.lit(max_dict)
    )
    return over.agg(
        F.lit("boilerplate_dict").alias("cap_name"),
        F.lit(max_dict).cast("int").alias("cap_value"),
        F.coalesce(F.count("*"), F.lit(0)).alias("dropped_groups"),
        F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("dropped_rows"),
    )


__all__ = [
    "boilerplate_dictionary",
    "remove_boilerplate_spans",
    "boilerplate_drop_audit",
]
