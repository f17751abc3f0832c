"""PDF content-stream tokenizer (operators/pdfstream).

The canonical Arrow path must handle operator interleavings the derived
corpus never produces (escaped strings, Td before any Tm, comments,
fractional operands); the JVM twin is only contracted for the derived
block shape — twin-equality is asserted on the derived corpus, the
loose inputs are canonical-path-only."""

from __future__ import annotations


from cloud_ocr_summarizer_spark.operators.pdfstream import (
    assemble_pdf_main_text,
    parse_pdf_text_spans,
    parse_pdf_text_spans_simple,
)

SCHEMA = "doc_id long, payload binary"


def _spans(spark, rows, fn=parse_pdf_text_spans):
    df = fn(spark.createDataFrame(rows, SCHEMA))
    return [tuple(r) for r in df.orderBy("doc_id", "seq").collect()]


def test_tm_td_state_machine(spark):
    payload = (
        b"BT 1 0 0 1 100 700 Tm (first) Tj 0 -12 Td (second) Tj "
        b"5 -3 Td (third) Tj ET\n"
        b"BT 1 0 0 1 400 650 Tm (fourth) Tj ET"
    )
    assert _spans(spark, [(1, payload)]) == [
        (1, 0, 100, 700, "first"),
        (1, 1, 100, 688, "second"),
        (1, 2, 105, 685, "third"),  # Td accumulates within the segment
        (1, 3, 400, 650, "fourth"),  # Tm resets absolutely
    ]


def test_td_before_any_tm_is_origin_relative(spark):
    payload = b"BT 30 40 Td (early) Tj ET"
    assert _spans(spark, [(1, payload)]) == [(1, 0, 30, 40, "early")]


def test_escaped_strings_and_comments(spark):
    payload = (
        b"% header comment with (parens) and BT Tj noise\n"
        b"BT 1 0 0 1 10 20 Tm (a \\(b\\) c \\\\ d) Tj ET\n"
        b"%%EOF"
    )
    assert _spans(spark, [(1, payload)]) == [(1, 0, 10, 20, "a (b) c \\ d")]


def test_fractional_operands_round(spark):
    payload = b"BT 1 0 0 1 10.6 20.4 Tm (frac) Tj ET"
    assert _spans(spark, [(1, payload)]) == [(1, 0, 11, 20, "frac")]


def test_null_empty_and_textless_payloads(spark):
    rows = [(1, None), (2, b""), (3, b"%PDF-1.4\n%%EOF"), (4, b"BT ET")]
    assert _spans(spark, rows) == []


def test_twin_equality_on_derived_corpus(spark):
    from cloud_ocr_summarizer_spark.datagen import derive_pdf_streams_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    pdfs = derive_pdf_streams_from_documents(docs)
    a = sorted(map(tuple, parse_pdf_text_spans(pdfs).collect()))
    b = sorted(map(tuple, parse_pdf_text_spans_simple(pdfs).collect()))
    assert a == b and len(a) > 0
    # Td second lines must actually occur in the corpus
    assert any((720 - t[3] - 12) % 40 == 0 for t in a), (
        "no Td second lines exercised"
    )


def test_main_text_reading_order_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 wA wB wC wD wE wF wG wH"), (2, "")],
        "doc_id long, text string",
    )
    from cloud_ocr_summarizer_spark.datagen import derive_pdf_streams_from_documents

    spans = parse_pdf_text_spans(derive_pdf_streams_from_documents(docs))
    out = {r["doc_id"]: r for r in assemble_pdf_main_text(docs, spans).collect()}
    # newspaper order: blocks 0 and 2 (left column, y desc) before
    # block 1 (right column) — NOT source order
    assert out[1]["main_text"] == (
        "w1 w2 w3 w4 w5 w6 w7 w8 wH w9 wA wB wC wD wE wF wG"
    )
    assert out[1]["n_spans"] == 5
    assert out[2]["main_text"] == "" and out[2]["n_spans"] == 0


def test_media_pdf_layout_round_trip(spark):
    """Media spans -> derived PDF payloads -> parse -> per-asset
    reassembly reproduces the expected caption lines, single- and
    two-line variants both present."""
    from cloud_ocr_summarizer_spark.plans.queries import q_media_pdf_layout

    rows = q_media_pdf_layout(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_lines = {1: 0, 2: 0}
    for r in rows:
        assert r["asset_text"].startswith("asset gs://corpus/")
        if r["n_lines"] == 2:
            assert f"doc {r['doc_id']} span {r['offset']}" in r["asset_text"]
        by_lines[r["n_lines"]] += 1
    assert by_lines[1] > 0 and by_lines[2] > 0


def test_bt_resets_position(spark):
    """BT starts a new text object at the origin (ISO 32000 §9.4.1) —
    a Tj with no Tm in the second object must NOT inherit the previous
    object's position."""
    payload = (
        b"BT 1 0 0 1 50 700 Tm (a) Tj ET "
        b"BT (b) Tj 5 5 Td (c) Tj ET"
    )
    assert _spans(spark, [(1, payload)]) == [
        (1, 0, 50, 700, "a"),
        (1, 1, 0, 0, "b"),
        (1, 2, 5, 5, "c"),
    ]


def test_percent_inside_string_is_not_a_comment(spark):
    payload = b"% real comment (with parens)\nBT 1 0 0 1 10 20 Tm (50% off) Tj ET"
    assert _spans(spark, [(1, payload)]) == [(1, 0, 10, 20, "50% off")]


def test_utf8_payload_round_trip(spark):
    payload = "BT 1 0 0 1 10 20 Tm (café naïve) Tj ET".encode()
    assert _spans(spark, [(1, payload)]) == [(1, 0, 10, 20, "café naïve")]
    b = _spans(spark, [(1, payload)], fn=parse_pdf_text_spans_simple)
    assert b == [(1, 0, 10, 20, "café naïve")]
