"""Arrow-vectorized extraction must match the expression path row-for-row
(and therefore the oracle, by transitivity with test_extract)."""

from pyspark.sql import functions as F

from cloud_ocr_summarizer_spark.datagen import interleaved_docs
from cloud_ocr_summarizer_spark.operators.extract import extract_span_rows
from cloud_ocr_summarizer_spark.operators.extract_arrow import (
    extract_span_rows_arrow,
)
from tests.test_extract import EDGE_DOCS, SPAN_SCHEMA, docs_schema, to_rows


def rows_key(collected):
    return sorted(
        (r["doc_id"], r["seq"], r["kind"], r["text"], r["media_ref"], r["offset"])
        for r in collected
    )


def test_arrow_matches_expression_on_edge_docs(spark):
    df = spark.createDataFrame(to_rows(EDGE_DOCS), docs_schema(SPAN_SCHEMA))
    assert rows_key(extract_span_rows_arrow(df).collect()) == rows_key(
        extract_span_rows(df).collect()
    )


def test_arrow_matches_expression_on_generated(spark):
    df = interleaved_docs(spark, 300, seed=42).cache()
    got = rows_key(extract_span_rows_arrow(df).collect())
    want = rows_key(extract_span_rows(df).collect())
    assert got == want
    df.unpersist()


def test_arrow_size_gate(spark):
    rows = [
        ("small", [{"kind": "TEXT", "text": "ok", "media_ref": None, "offset": 0}]),
        ("big", [{"kind": "TEXT", "text": "x" * 2000, "media_ref": None, "offset": 0}]),
    ]
    df = spark.createDataFrame(rows, docs_schema(SPAN_SCHEMA))
    out = extract_span_rows_arrow(df, max_text_bytes=1000).collect()
    assert {r["doc_id"] for r in out} == {"small"}


def test_arrow_confidence_gate(spark):
    from tests.test_extract import SPAN_CONF_SCHEMA

    rows = [
        (
            "c",
            [
                {"kind": "TEXT", "text": "hi", "media_ref": None, "offset": 0, "confidence": 0.9},
                {"kind": "TEXT", "text": "lo", "media_ref": None, "offset": 1, "confidence": 0.3},
                {"kind": "TEXT", "text": "nul", "media_ref": None, "offset": 2, "confidence": None},
            ],
        )
    ]
    df = spark.createDataFrame(rows, docs_schema(SPAN_CONF_SCHEMA))
    out = extract_span_rows_arrow(df, min_confidence=0.7).collect()
    assert [r["text"] for r in sorted(out, key=lambda r: r["seq"])] == ["hi", "nul"]

def test_fused_matches_two_stage(spark):
    from cloud_ocr_summarizer_spark.operators.classify import classify_spans_detailed
    from cloud_ocr_summarizer_spark.operators.extract_arrow import (
        extract_and_classify_arrow,
    )

    df = interleaved_docs(spark, 150, seed=42).cache()
    fused = {
        (r["doc_id"], r["seq"]): (r["kind"], r["text"], r["media_ref"], r["offset"],
                                  r["content_score"], r["is_content"])
        for r in extract_and_classify_arrow(df).collect()
    }
    staged = {
        (r["doc_id"], r["seq"]): (r["kind"], r["text"], r["media_ref"], r["offset"],
                                  r["content_score"], r["is_content"])
        for r in classify_spans_detailed(extract_span_rows_arrow(df)).collect()
    }
    assert fused == staged
    df.unpersist()


def test_arrow_normalize_fuzz_matches_oracle():
    """The pandas regex normalization must equal the pure-Python spec."""
    import random

    import pandas as pd

    from cloud_ocr_summarizer_spark import oracle
    from cloud_ocr_summarizer_spark.operators.extract_arrow import _normalize_series

    rng = random.Random(7)
    pieces = ["a", "bb", "x y", " ", "  ", "\t", "\n", "\n\n", "\r", "w\tw", ""]
    strings = [
        "".join(rng.choice(pieces) for _ in range(rng.randint(0, 12)))
        for _ in range(500)
    ]
    got = _normalize_series(pd.Series(strings, dtype="string"))
    for s, g in zip(strings, got):
        assert g == oracle.normalize_block_text(s), repr(s)


def test_arrow_native_matches_expression(spark):
    from cloud_ocr_summarizer_spark.operators.extract_arrow_native import (
        extract_span_rows_arrow_native,
    )

    df = spark.createDataFrame(to_rows(EDGE_DOCS), docs_schema(SPAN_SCHEMA))
    assert rows_key(extract_span_rows_arrow_native(df).collect()) == rows_key(
        extract_span_rows(df).collect()
    )
    gen = interleaved_docs(spark, 300, seed=42).cache()
    assert rows_key(extract_span_rows_arrow_native(gen).collect()) == rows_key(
        extract_span_rows(gen).collect()
    )
    gen.unpersist()


def test_arrow_native_gates(spark):
    from tests.test_extract import SPAN_CONF_SCHEMA
    from cloud_ocr_summarizer_spark.operators.extract_arrow_native import (
        extract_span_rows_arrow_native,
    )

    rows = [
        ("big", [{"kind": "TEXT", "text": "x" * 2000, "media_ref": None, "offset": 0,
                  "confidence": None}]),
        ("ok", [
            {"kind": "TEXT", "text": "keep me", "media_ref": None, "offset": 0,
             "confidence": 0.9},
            {"kind": "TEXT", "text": "drop me", "media_ref": None, "offset": 1,
             "confidence": 0.1},
        ]),
    ]
    df = spark.createDataFrame(rows, docs_schema(SPAN_CONF_SCHEMA))
    out = extract_span_rows_arrow_native(
        df, min_confidence=0.5, max_text_bytes=1000
    ).collect()
    assert [(r["doc_id"], r["text"]) for r in out] == [("ok", "keep me")]


def test_bbox_geometry_rowlocal_vs_arrow(spark):
    """The nested bbox of the row-local path and the flat (x0,x1,y0,y1)
    of the Arrow path must encode identical geometry for every span."""
    from cloud_ocr_summarizer_spark.datagen import interleaved_docs
    from cloud_ocr_summarizer_spark.operators.extract import extract_span_rows
    from cloud_ocr_summarizer_spark.operators.extract_arrow import (
        extract_span_rows_arrow,
    )

    docs = interleaved_docs(spark, 60, seed=5)
    jvm = {
        (r["doc_id"], r["seq"]): (
            r["bbox"][0]["x"], r["bbox"][2]["x"], r["bbox"][0]["y"], r["bbox"][2]["y"]
        )
        for r in extract_span_rows(docs, include_bounding_boxes=True).collect()
    }
    arrow = {
        (r["doc_id"], r["seq"]): (r["x0"], r["x1"], r["y0"], r["y1"])
        for r in extract_span_rows_arrow(
            docs, include_bounding_boxes=True
        ).collect()
    }
    assert jvm == arrow  # bit-identical doubles, same span set
    # vertices are a sane normalized box: 4 points, 0 <= coords <= 1,
    # media spans narrower than text spans
    some = extract_span_rows(docs, include_bounding_boxes=True).collect()
    for r in some:
        assert len(r["bbox"]) == 4
        for v in r["bbox"]:
            assert 0.0 <= v["x"] <= 1.0 and 0.0 <= v["y"] <= 1.0
        width = round(r["bbox"][1]["x"] - r["bbox"][0]["x"], 6)
        assert width == (0.5 if r["media_ref"] is not None else 0.9)


def test_bbox_gated_off_by_default(spark):
    from cloud_ocr_summarizer_spark.datagen import interleaved_docs
    from cloud_ocr_summarizer_spark.operators.extract import extract_span_rows
    from cloud_ocr_summarizer_spark.operators.extract_arrow import (
        extract_span_rows_arrow,
    )

    docs = interleaved_docs(spark, 5, seed=5)
    assert "bbox" not in extract_span_rows(docs).columns
    assert "x0" not in extract_span_rows_arrow(docs).columns


def test_select_primary_language_semantics(spark):
    """Argmax over array<struct<lang,conf>>: first max wins ties, empty
    annotations take the default and flag used_default."""
    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.operators.textstats import (
        select_primary_language,
    )

    rows = [
        (1, [("de", 0.9), ("en", 0.5)]),     # clear winner
        (2, [("de", 0.7), ("en", 0.7)]),     # tie -> first in order
        (3, []),                               # empty -> default
        (4, [("fr", 0.1)]),                    # single
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, languages array<struct<lang:string,conf:double>>"
    )
    got = {
        r["doc_id"]: (r["primary_lang"], r["used_default"])
        for r in select_primary_language(df, default="ja").collect()
    }
    assert got == {
        1: ("de", False),
        2: ("de", False),
        3: ("ja", True),
        4: ("fr", False),
    }


def test_bbox_geometry_duplicate_doc_ids(spark):
    """Regression: adjacent input rows sharing a doc_id must keep their
    OWN y-bands (per input row, like the JVM twin) — grouping on doc_id
    values merged them into one band and broke the tiling invariant."""
    from cloud_ocr_summarizer_spark.operators.extract import extract_span_rows
    from cloud_ocr_summarizer_spark.operators.extract_arrow import (
        extract_span_rows_arrow,
    )

    span = lambda off, t: ("TEXT", t, None, off)  # noqa: E731
    rows = [
        (7, [span(0, "a"), span(1, "b")]),
        (7, [span(0, "c")]),          # SAME doc_id, next row
        (8, [span(0, "d"), span(1, "e"), span(2, "f")]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    ).coalesce(1)  # one batch: adjacent rows
    jvm = sorted(
        (r["text"], r["bbox"][0]["y"], r["bbox"][2]["y"])
        for r in extract_span_rows(df, include_bounding_boxes=True).collect()
    )
    arrow = sorted(
        (r["text"], r["y0"], r["y1"])
        for r in extract_span_rows_arrow(df, include_bounding_boxes=True).collect()
    )
    assert jvm == arrow
    # per-row bands: the single-span second row spans the full page
    assert ("c", 0.0, 1.0) in arrow
