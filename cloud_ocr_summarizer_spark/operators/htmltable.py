"""HTML table extraction: <table>/<tr>/<td> grids out of tag soup.

Main-content extraction (operators/dom.py) deliberately flattens markup
to running text; tables are the one block type where that LOSES the
signal — a training-data pipeline wants the grid (row/column structure)
as structured records, both to keep tabular data intact and to filter
pages that are mostly layout tables.  This module recovers the grid.

Reference tie-in: the reference's block segmentation
(vision_processor.py:146-326) emits typed blocks but has no cross-cell
table structure; this extends the extraction surface the same way the
dom.py readability pair does.

Scale design: everything is row-local JVM regexp work — comment strip,
then a three-level non-greedy DOTALL scan (tables -> rows -> cells)
expressed as ``regexp_extract_all`` + ``posexplode`` at each level.
Zero shuffles, zero Python; per-cell output rows are bounded by the
document's own size (the same explode bound as spans extraction).  The
row-record variant assembles each row's cells with a row-LOCAL
``transform``/``array_join`` — no collect_list, no aggregation state.

Synthesis (datagen convention — every cell re-derivable from doc_id
arithmetic so the DuckDB twin never parses HTML):
  doc d carries ``1 + d % 2`` tables; table t has a ``<th>`` header row
  iff (d + t) % 2 == 0, then ``1 + (d + t) % 3`` data rows of
  ``2 + (d + t) % 2`` columns.  Data cell (r, c) (1-based) is empty iff
  (d + r + c) % 7 == 0, else ``c-d-t-r-c``; cells with (r + c) % 3 == 0
  wrap their text in a nested ``<span>`` the extractor must strip.
  Header cell c is ``h-d-t-c``.  Traps: a DECOY table inside an HTML
  comment, ``<thead>``/``<tbody>`` wrappers (a naive ``<t[dh][^>]*>``
  cell regex matches ``<thead>``), tag attributes, and whitespace
  noise between tags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column

_DECOY = (
    "<!-- archived: <table><tr><td>decoy-cell</td></tr></table> -->"
)

# require whitespace before attributes so <thead>/<tbody> never match
_TABLE_RE = r"(?s)<table(?:\s[^>]*)?>(.*?)</table>"
_TR_RE = r"(?s)<tr(?:\s[^>]*)?>(.*?)</tr>"
_CELL_RE = r"(?s)<t[dh](?:\s[^>]*)?>(.*?)</t[dh]>"


def derive_tables_html_from_documents(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, html) with arithmetic-derivable tables."""
    d = F.col("doc_id")

    def _cell(t: Column, r: Column, c: Column) -> Column:
        txt = F.when((d + r + c) % 7 == 0, F.lit("")).otherwise(
            F.concat_ws(
                "-",
                F.lit("c"),
                d.cast("string"),
                t.cast("string"),
                r.cast("string"),
                c.cast("string"),
            )
        )
        wrapped = F.when(
            (r + c) % 3 == 0,
            F.concat(F.lit("<span class=v>"), txt, F.lit("</span>")),
        ).otherwise(txt)
        return F.concat(F.lit('<td align="left">'), wrapped, F.lit("</td>"))

    def _table(t: Column) -> Column:
        n_rows = 1 + (d + t) % 3
        n_cols = 2 + (d + t) % 2
        header = F.when(
            (d + t) % 2 == 0,
            F.concat(
                F.lit("<thead><tr>"),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), n_cols),
                        lambda c: F.concat(
                            F.lit("<th>"),
                            F.concat_ws(
                                "-",
                                F.lit("h"),
                                d.cast("string"),
                                t.cast("string"),
                                c.cast("string"),
                            ),
                            F.lit("</th>"),
                        ),
                    ),
                    "",
                ),
                F.lit("</tr></thead>\n"),
            ),
        ).otherwise(F.lit(""))
        body = F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_rows),
                lambda r: F.concat(
                    F.lit('<tr class="r">'),
                    F.array_join(
                        F.transform(
                            F.sequence(F.lit(1), n_cols),
                            lambda c: _cell(t, r, c),
                        ),
                        " ",
                    ),
                    F.lit("</tr>\n"),
                ),
            ),
            "",
        )
        return F.concat(
            F.lit('<table class="data">\n'),
            header,
            F.lit("<tbody>\n"),
            body,
            F.lit("</tbody></table>"),
        )

    tables = F.array_join(
        F.transform(F.sequence(F.lit(0), d % 2), _table), "\n<p>between</p>\n"
    )
    html = F.concat(
        F.lit("<html><body><p>"),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit("</p>\n" + _DECOY + "\n"),
        tables,
        F.lit("\n<p>after</p></body></html>"),
    )
    return docs.select(d.alias("doc_id"), html.alias("html"))


def _strip_tags(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"(?s)<[^>]+>", ""))


def extract_tables(
    html_df: DataFrame, *, html_col: str = "html"
) -> DataFrame:
    """(…, html) -> one row per cell, grid coordinates attached.

    Output: passthrough + (table_idx, row_idx, col_idx, is_header,
    cell_text) — row_idx counts ALL rows in the table (header first),
    all indices 0-based.  Comments stripped first (decoy trap), nested
    markup inside a cell stripped to text.  Entirely row-local.
    """
    tables = F.regexp_extract_all(
        F.regexp_replace(F.col(html_col), r"(?s)<!--.*?-->", ""),
        F.lit(_TABLE_RE),
        1,
    )
    rows = F.regexp_extract_all(F.col("_tbl"), F.lit(_TR_RE), 1)
    cells = F.regexp_extract_all(F.col("_row"), F.lit(_CELL_RE), 1)
    passthrough = [c for c in html_df.columns if c != html_col]
    return (
        html_df.select(
            *passthrough, F.posexplode(tables).alias("_ti", "_tbl")
        )
        .select(
            *passthrough,
            F.col("_ti").cast("int").alias("table_idx"),
            F.posexplode(rows).alias("_ri", "_row"),
        )
        .select(
            *passthrough,
            "table_idx",
            F.col("_ri").cast("int").alias("row_idx"),
            F.col("_row").rlike("<th[ >]").alias("is_header"),
            F.posexplode(cells).alias("_ci", "_cell"),
        )
        .select(
            *passthrough,
            "table_idx",
            "row_idx",
            F.col("_ci").cast("int").alias("col_idx"),
            "is_header",
            _strip_tags(F.col("_cell")).alias("cell_text"),
        )
    )


def table_records(
    html_df: DataFrame, *, html_col: str = "html", sep: str = " | "
) -> DataFrame:
    """(…, html) -> one row per table ROW, cells joined row-locally.

    The record-assembly consumer: (table_idx, row_idx, is_header,
    n_cols, row_text).  Cells are joined inside the row's own string
    with ``transform`` + ``array_join`` — no aggregation, so there is
    no collect_list state to cap and the plan stays map-only.
    """
    tables = F.regexp_extract_all(
        F.regexp_replace(F.col(html_col), r"(?s)<!--.*?-->", ""),
        F.lit(_TABLE_RE),
        1,
    )
    rows = F.regexp_extract_all(F.col("_tbl"), F.lit(_TR_RE), 1)
    cell_arr = F.regexp_extract_all(F.col("_row"), F.lit(_CELL_RE), 1)
    passthrough = [c for c in html_df.columns if c != html_col]
    return (
        html_df.select(
            *passthrough, F.posexplode(tables).alias("_ti", "_tbl")
        )
        .select(
            *passthrough,
            F.col("_ti").cast("int").alias("table_idx"),
            F.posexplode(rows).alias("_ri", "_row"),
        )
        .select(
            *passthrough,
            "table_idx",
            F.col("_ri").cast("int").alias("row_idx"),
            F.col("_row").rlike("<th[ >]").alias("is_header"),
            F.size(cell_arr).cast("int").alias("n_cols"),
            F.array_join(
                F.transform(cell_arr, _strip_tags), sep
            ).alias("row_text"),
        )
    )
