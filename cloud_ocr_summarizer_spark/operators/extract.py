"""Flagship extraction: interleaved spans -> ordered, classified sequences.

Two physical strategies for the same logical operator (SURVEY.md §2.3):

* ``extract_spans`` — ROW-LOCAL.  Spans never leave their row; filtering,
  classification, text assembly and offset-ordering happen with higher-order
  functions (filter/transform/sort_array) entirely inside WholeStageCodegen.
  ZERO shuffles — at 100 TB this is a pure map stage whose cost scales
  linearly with input splits, so it is the default.

* ``extract_spans_exploded`` — EXPLODE + HASH-AGG.  explode -> per-span
  ops -> deterministic reassembly via collect_list + per-doc array_sort
  (SURVEY.md §4.3(2); the ordered-window collect_list form lives on in
  skew.reassemble_chunks where chunk order genuinely crosses rows).  One
  shuffle on doc_id.  Needed when per-span work must cross rows (e.g. a
  batched pandas classifier that rebalances skewed media-heavy docs).

Both implement the same contract as oracle.extract_document; golden tests
assert all three agree span-for-span.

Reference semantics: nested-loop flatten + bottom-up text assembly,
src/processors/vision_processor.py:146-208 (simple) / :210-402 (detailed);
positional ordering :182,:241; confidence gate :261-264; size gate :43-48.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cloud_ocr_summarizer_spark import config
from cloud_ocr_summarizer_spark.functions.text import (
    classify_kind_col,
    normalize_block_text_col,
    token_count_col,
)

# Output span struct: the span-sequence-equality contract fields.
SPAN_FIELDS = ("kind", "text", "media_ref", "offset")


def _has_confidence(df: DataFrame, spans_col: str) -> bool:
    element = df.schema[spans_col].dataType.elementType
    return "confidence" in element.fieldNames()


def _canonical_struct(s: Column) -> Column:
    """Classify + assemble one span, field-ordered for deterministic
    struct sorting.

    Struct comparison is field-by-field with nulls first, so sorting on
    (offset, kind, text, media_ref) matches oracle.extract_document's
    tie-break exactly — no duplicated sort-key strings (halves the
    string allocations on the hot path vs a separate-key design).
    """
    kind = classify_kind_col(s["kind"])
    is_media = kind.isin(*config.MEDIA_KINDS)
    is_text = kind.isin(*config.TEXT_KINDS)
    text = F.when(is_media, F.lit(None).cast("string")).otherwise(
        normalize_block_text_col(s["text"])
    )
    media_ref = F.when(is_text, F.lit(None).cast("string")).otherwise(s["media_ref"])
    offset = s["offset"].cast("int")
    return F.struct(
        offset.alias("offset"),
        kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
    )


def _project_out(s: Column) -> Column:
    return F.struct(
        s["kind"].alias("kind"),
        s["text"].alias("text"),
        s["media_ref"].alias("media_ref"),
        s["offset"].alias("offset"),
    )


def _confidence_filtered(df: DataFrame, spans_col: str, min_confidence: float) -> Column:
    spans = F.col(spans_col)
    if _has_confidence(df, spans_col):
        # detailed-mode gate, vision_processor.py:261-264; null passes
        # (simple mode carries confidence=None, :177)
        spans = F.filter(
            spans,
            lambda s: s["confidence"].isNull()
            | (s["confidence"] >= F.lit(min_confidence)),
        )
    return spans


def _doc_text_bytes(spans_col: str) -> Column:
    """Total raw text bytes per doc — size-gate input (settings.py:66)."""
    return F.aggregate(
        F.col(spans_col),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.octet_length(s["text"]), F.lit(0)),
    )


def extract_spans(
    df: DataFrame,
    *,
    spans_col: str = "spans",
    min_confidence: float = config.MIN_CONFIDENCE_THRESHOLD,
    max_text_bytes: int = config.MAX_DOC_TEXT_BYTES,
    with_stats: bool = True,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Row-local flagship extraction (zero shuffles).

    Input : doc_id, spans array<struct<kind,text,media_ref,offset[,confidence]>>
    Output: doc_id, spans_out (ordered canonical spans) [+ n_spans, n_tokens]
    Oversize docs (raw text > ``max_text_bytes``) are rejected, mirroring
    the reference's 10 MB gate (vision_processor.py:43-48).
    ``keep`` carries extra input columns through unchanged (same
    convention as datagen.derive_spans_from_documents) so downstream
    row-local stages never pay a doc_id re-join shuffle.
    """
    gated = df.filter(_doc_text_bytes(spans_col) <= F.lit(max_text_bytes))
    spans = _confidence_filtered(gated, spans_col, min_confidence)
    ordered = F.sort_array(F.transform(spans, _canonical_struct))
    out = gated.withColumn("spans_out", F.transform(ordered, _project_out))
    cols = [F.col("doc_id"), F.col("spans_out")]
    if with_stats:
        cols += [
            F.size("spans_out").alias("n_spans"),
            F.aggregate(
                F.filter(F.col("spans_out"), lambda s: s["text"].isNotNull()),
                F.lit(0),
                lambda acc, s: acc + token_count_col(s["text"]),
            ).alias("n_tokens"),
        ]
    return out.select(*cols, *[F.col(c) for c in keep])


def extract_spans_exploded(
    df: DataFrame,
    *,
    spans_col: str = "spans",
    min_confidence: float = config.MIN_CONFIDENCE_THRESHOLD,
    max_text_bytes: int = config.MAX_DOC_TEXT_BYTES,
) -> DataFrame:
    """Explode/aggregate variant: same contract, one shuffle on doc_id.

    Deterministic reassembly WITHOUT a window: hash-aggregate
    collect_list of the canonical structs, then ``array_sort`` puts each
    doc's spans in (offset, kind, text, media) order inside the array —
    struct comparison is field-by-field with nulls first, identical to
    the row-local path's sort (naive groupBy+collect_list alone is
    nondeterministic post-shuffle — SURVEY.md §4.3(2); the per-doc
    array_sort restores determinism).  Hash aggregation avoids the
    whole-partition sort a row_number window needs — measured 1.7x faster
    at 120k docs, and no sort spill at scale.  Docs whose every span was
    filtered — and empty docs — still emit a row with an empty spans_out
    (explode_outer + collect_list dropping nulls keep them).
    """
    gated = df.filter(_doc_text_bytes(spans_col) <= F.lit(max_text_bytes))
    spans = _confidence_filtered(gated, spans_col, min_confidence)
    exploded = gated.select(
        "doc_id", F.explode_outer(F.transform(spans, _canonical_struct)).alias("s")
    )
    agg = exploded.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.col("s"))).alias("sorted_spans")
    )
    return agg.select(
        "doc_id",
        F.transform(F.col("sorted_spans"), _project_out).alias("spans_out"),
    )


# Detailed-mode layout geometry (normalized_vertices analogue, reference
# vision_processor.py:304-313, 344-353, 382-391): a deterministic
# single-column page model — span k of n occupies the vertical band
# [(k-1)/n, k/n]; text spans run nearly full-width, media spans are
# narrower and offset right (so centroid_x distinguishes the kinds).
BBOX_X_TEXT = (0.05, 0.95)
BBOX_X_MEDIA = (0.30, 0.80)


def _bbox_col(pos: Column, n: Column, is_media: Column) -> Column:
    """4 normalized vertices (clockwise from top-left), like the Vision
    API's boundingBox.normalizedVertices."""
    y0 = pos.cast("double") / n
    y1 = (pos + 1).cast("double") / n
    x0 = F.when(is_media, F.lit(BBOX_X_MEDIA[0])).otherwise(F.lit(BBOX_X_TEXT[0]))
    x1 = F.when(is_media, F.lit(BBOX_X_MEDIA[1])).otherwise(F.lit(BBOX_X_TEXT[1]))
    return F.array(
        F.struct(x0.alias("x"), y0.alias("y")),
        F.struct(x1.alias("x"), y0.alias("y")),
        F.struct(x1.alias("x"), y1.alias("y")),
        F.struct(x0.alias("x"), y1.alias("y")),
    )


def extract_span_rows(
    df: DataFrame,
    *,
    spans_col: str = "spans",
    min_confidence: float = config.MIN_CONFIDENCE_THRESHOLD,
    include_bounding_boxes: bool = False,
) -> DataFrame:
    """Flat per-span output: (doc_id, seq, kind, text, media_ref, offset).

    ``seq`` is the 1-based reading-order position (positional numbering,
    vision_processor.py:182) — this row shape is what the driver's DuckDB
    oracle cross-checks, and what downstream per-span operators consume.
    Row-local sort then posexplode: still zero shuffles.

    ``include_bounding_boxes`` (P5 column gating, like the reference's
    include-geometry detailed mode) appends ``bbox`` — 4 normalized
    (x, y) vertices from the deterministic layout model above.  Off by
    default: the column (and its arithmetic) is never materialized
    unless asked for.
    """
    extracted = extract_spans(
        df, spans_col=spans_col, min_confidence=min_confidence, with_stats=False
    )
    # posexplode_outer: plain posexplode makes Catalyst inject a
    # size(...)>0 pre-filter that re-evaluates the whole spans expression;
    # outer + a post-generate null filter evaluates it once.
    flat = extracted.select(
        "doc_id", F.size("spans_out").alias("_n"),
        F.posexplode_outer("spans_out").alias("pos", "s"),
    ).filter(F.col("pos").isNotNull())
    cols = [
        F.col("doc_id"),
        (F.col("pos") + 1).alias("seq"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    ]
    if include_bounding_boxes:
        cols.append(
            _bbox_col(
                F.col("pos"), F.col("_n"), F.col("s.media_ref").isNotNull()
            ).alias("bbox")
        )
    return flat.select(*cols)
