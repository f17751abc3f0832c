"""HTML table grids: extraction traps + synthesis round trip."""

from cloud_ocr_summarizer_spark.operators.htmltable import (
    derive_tables_html_from_documents,
    extract_tables,
    table_records,
)


def _html(spark, body):
    return spark.createDataFrame(
        [(0, f"<html><body>{body}</body></html>")], "doc_id long, html string"
    )


def test_comment_decoy_table_ignored(spark):
    rows = extract_tables(
        _html(
            spark,
            "<!-- <table><tr><td>decoy</td></tr></table> -->"
            "<table><tr><td>real</td></tr></table>",
        )
    ).collect()
    assert [r.cell_text for r in rows] == ["real"]


def test_thead_tbody_wrappers_are_not_cells(spark):
    rows = extract_tables(
        _html(
            spark,
            "<table><thead><tr><th>H</th></tr></thead>"
            "<tbody><tr><td>D</td></tr></tbody></table>",
        )
    ).orderBy("row_idx").collect()
    assert [(r.row_idx, r.is_header, r.cell_text) for r in rows] == [
        (0, True, "H"),
        (1, False, "D"),
    ]


def test_nested_markup_stripped_from_cells(spark):
    rows = extract_tables(
        _html(
            spark,
            '<table><tr><td><span class="v">a <b>b</b></span></td>'
            "<td align='r'>  c  </td></tr></table>",
        )
    ).orderBy("col_idx").collect()
    assert [r.cell_text for r in rows] == ["a b", "c"]


def test_multiple_tables_indexed_in_order(spark):
    rows = extract_tables(
        _html(
            spark,
            "<table><tr><td>t0</td></tr></table><p>x</p>"
            "<table><tr><td>t1a</td><td>t1b</td></tr></table>",
        )
    ).orderBy("table_idx", "col_idx").collect()
    assert [(r.table_idx, r.col_idx, r.cell_text) for r in rows] == [
        (0, 0, "t0"),
        (1, 0, "t1a"),
        (1, 1, "t1b"),
    ]


def _python_grid(n):
    cells = []
    for d in range(n):
        for t in range(1 + d % 2):
            hh = 1 if (d + t) % 2 == 0 else 0
            n_rows = 1 + (d + t) % 3
            n_cols = 2 + (d + t) % 2
            if hh:
                for c in range(1, n_cols + 1):
                    cells.append((d, t, 0, c - 1, True, f"h-{d}-{t}-{c}"))
            for r in range(1, n_rows + 1):
                for c in range(1, n_cols + 1):
                    txt = "" if (d + r + c) % 7 == 0 else f"c-{d}-{t}-{r}-{c}"
                    cells.append((d, t, r - 1 + hh, c - 1, False, txt))
    return sorted(cells)


def test_synthesis_round_trip_matches_python_model(spark):
    n = 14
    docs = spark.createDataFrame(
        [(i, f"body {i}") for i in range(n)], "doc_id long, text string"
    )
    got = sorted(
        map(
            tuple,
            extract_tables(derive_tables_html_from_documents(docs)).collect(),
        )
    )
    assert got == _python_grid(n)


def test_records_join_cells_in_column_order(spark):
    rows = table_records(
        _html(spark, "<table><tr><td>a</td><td></td><td>c</td></tr></table>")
    ).collect()
    assert len(rows) == 1
    assert rows[0].n_cols == 3
    assert rows[0].row_text == "a |  | c"
    assert rows[0].is_header is False
