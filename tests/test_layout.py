"""Layout parsing: block segmentation + reading order (operators/layout.py)."""

from pyspark.sql import Row

from cloud_ocr_summarizer_spark.operators.layout import (
    assemble_reading_order,
    block_rollup,
    derive_two_column_geometry,
    segment_blocks,
)


_GEO_SCHEMA = (
    "doc_id long, page int, col int, y0 int, y1 int, "
    "text string, media_ref string"
)
_SEQ_SCHEMA = "doc_id long, seq int, text string, media_ref string"


def _geo_row(doc, page, col, y0, y1, text):
    return Row(
        doc_id=doc, page=page, col=col, y0=y0, y1=y1,
        text=text, media_ref=None,
    )


def test_segment_blocks_gap_semantics(spark):
    """Gap == threshold stays in the block; gap > threshold splits;
    columns and pages segment independently."""
    rows = [
        # col 0: gaps 50 (stay), 51 (split)
        _geo_row(1, 0, 0, 0, 40, "a"),
        _geo_row(1, 0, 0, 90, 130, "b"),     # gap 50 == threshold
        _geo_row(1, 0, 0, 181, 221, "c"),    # gap 51 > threshold
        # col 1: single span
        _geo_row(1, 0, 1, 0, 40, "d"),
        # page 1 col 0: segmentation restarts
        _geo_row(1, 1, 0, 500, 540, "e"),
    ]
    out = segment_blocks(spark.createDataFrame(rows, _GEO_SCHEMA), gap_threshold=50)
    got = {
        (r.page, r.col, r.text): r.block_id
        for r in out.collect()
    }
    assert got[(0, 0, "a")] == 1
    assert got[(0, 0, "b")] == 1
    assert got[(0, 0, "c")] == 2
    assert got[(0, 1, "d")] == 1
    assert got[(1, 0, "e")] == 1


def test_block_rollup_orders_text_top_down(spark):
    rows = [
        _geo_row(1, 0, 0, 60, 100, "second"),
        _geo_row(1, 0, 0, 0, 40, "first"),
        Row(doc_id=1, page=0, col=0, y0=120, y1=160,
            text=None, media_ref="gs://m/1"),  # media repr inline
    ]
    blocks = block_rollup(
        segment_blocks(spark.createDataFrame(rows, _GEO_SCHEMA), gap_threshold=50)
    ).collect()
    assert len(blocks) == 1
    b = blocks[0]
    assert b.block_text == "first second gs://m/1"
    assert (b.y_top, b.y_bottom, b.span_cnt) == (0, 160, 3)


def test_reading_order_is_column_major_not_offset_order(spark):
    """8 spans alternate columns in offset order; reading order must be
    all of column 0 top-down, then column 1 — different from seq order."""
    rows = spark.createDataFrame(
        [Row(doc_id=7, seq=k + 1, text=f"s{k + 1}", media_ref=None)
         for k in range(8)], _SEQ_SCHEMA
    )
    geo = derive_two_column_geometry(rows)
    ordered = (
        assemble_reading_order(block_rollup(segment_blocks(geo)))
        .orderBy("reading_seq")
        .collect()
    )
    # col 0 gets spans 1,3,5,7 (rows 0..3 -> block break after row 2),
    # col 1 gets spans 2,4,6,8
    texts = [r.block_text for r in ordered]
    cols = [r.col for r in ordered]
    assert cols == sorted(cols), "column-major order"
    assert texts == ["s1 s3 s5", "s7", "s2 s4 s6", "s8"]
    assert [r.reading_seq for r in ordered] == [1, 2, 3, 4]
    # offset-order concatenation would interleave columns — proves the
    # parser is not just echoing input order
    assert " ".join(texts) != " ".join(f"s{k + 1}" for k in range(8))


def test_deriver_page_rollover(spark):
    """Row 9 of a column starts page 1 with y reset."""
    rows = spark.createDataFrame(
        [Row(doc_id=1, seq=k + 1, text=f"s{k + 1}", media_ref=None)
         for k in range(20)], _SEQ_SCHEMA
    )
    geo = {r.seq: r for r in derive_two_column_geometry(rows).collect()}
    # seq 19 -> k=18 -> row 9 -> page 1, row-in-page 0
    assert (geo[19].page, geo[19].col, geo[19].y0) == (1, 0, 0)
    # seq 17 -> k=16 -> row 8 -> page 0 last row: y0 = 8*60 + 2*50
    assert (geo[17].page, geo[17].y0) == (0, 8 * 60 + 2 * 50)


def test_layout_partitioning_invariance(spark):
    rows = spark.createDataFrame(
        [Row(doc_id=d, seq=k + 1, text=f"d{d}s{k}", media_ref=None)
         for d in range(5) for k in range(11)], _SEQ_SCHEMA
    )

    def run(df):
        return sorted(
            (r.doc_id, r.reading_seq, r.page, r.col, r.block_text)
            for r in assemble_reading_order(
                block_rollup(segment_blocks(derive_two_column_geometry(df)))
            ).collect()
        )

    assert run(rows.repartition(7)) == run(rows.coalesce(1))


def test_rowlocal_twin_equals_flat_path(spark):
    """reading_order_rowlocal must be row-for-row identical to the
    segment/rollup/assemble chain on the same extracted spans."""
    from cloud_ocr_summarizer_spark.datagen import derive_spans_from_documents
    from cloud_ocr_summarizer_spark.operators.extract import (
        extract_span_rows,
        extract_spans,
    )
    from cloud_ocr_summarizer_spark.operators.layout import reading_order_rowlocal

    docs = spark.createDataFrame(
        [(d, " ".join(f"d{d}w{k}" for k in range(5 + (d * 7) % 90)))
         for d in range(1, 40)],
        "doc_id long, text string",
    )
    spans = derive_spans_from_documents(docs)
    flat = assemble_reading_order(
        block_rollup(segment_blocks(derive_two_column_geometry(
            extract_span_rows(spans)
        )))
    ).select("doc_id", "reading_seq", "page", "col", "block_text")
    fused = reading_order_rowlocal(extract_spans(spans, with_stats=False))
    a = sorted(map(tuple, flat.collect()))
    b = sorted(map(tuple, fused.collect()))
    assert a == b and len(a) > 40
