"""PDF content-stream text extraction (byte-stream tokenization).

The north star names "batched DOM/byte-stream tokenization" and
"PDF/image layout parsing for media_ref spans".  The reference never
parses PDF bytes itself — it ships whole pages to a vision API
(/root/reference/src/processors/vision_processor.py) — so this module
is the from-scratch Spark-native byte-stream half of that stage: parse
the TEXT OPERATORS of a PDF content stream (the `BT … ET` text-object
subset of ISO 32000-1 §9.4: `Tm` absolute text matrix, `Td` relative
line offset, `Tj` show-string) into positioned text spans that feed the
layout reading-order operators.

Physical strategy (mirrors operators/dom.py): one Arrow-batched
``mapInPandas`` stage where the WHOLE batch is tokenized at once by one
``str.extractall`` and the positioning state machine (Tm resets, Td
accumulates) is computed column-wise with reset-cumsum and slot-merge
tricks — zero per-row Python.  The JVM twin extracts the derived
corpus's fixed block shape with aligned ``regexp_extract_all`` calls —
WholeStageCodegen, zero Python — and carries the usual ``_simple``
caveat: it parses the structural subset the deriver emits, while the
canonical path handles arbitrary operator interleavings.

Token contract: numbers ``-?\\d+(\\.\\d+)?``, literal strings
``( … )`` with ``\\``-escapes (no nested parens), operator names, and
``%``-comments as an ignored token class (never inside a string —
the leftmost-match scan keeps a string's '%' in the string).  ``BT``
resets the position to the origin per ISO 32000 §9.4.1.  Scale shape: shuffle-free map over
the input's partitioning — the same plan class as the flagship
extractor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

# one pass over the stream: group 0 = literal-string body, 1 = number,
# 2 = operator name.  Comments are a TOKEN alternative (ignored after
# tokenization), NOT a pre-strip: a '%' inside a literal string belongs
# to the string, and the leftmost-match scan guarantees an open '('
# consumes it before the comment alternative can fire.
_PDF_TOKEN_RE = (
    r"\(((?:[^()\\]|\\.)*)\)|(-?\d+(?:\.\d+)?)|([A-Za-z]{1,3}\*?)|%[^\n]*"
)

SPAN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("line_text", T.StringType()),
    ]
)


def _parse_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "seq": pd.Series(dtype="int32"),
            "x": pd.Series(dtype="int32"),
            "y": pd.Series(dtype="int32"),
            "line_text": pd.Series(dtype="object"),
        }
    )
    pdf = pdf.reset_index(drop=True)
    # utf-8 to match the deriver's F.encode and the JVM twin's F.decode
    s = pdf["payload"].str.decode("utf-8", errors="replace").fillna("")
    toks = s.str.extractall(_PDF_TOKEN_RE)
    if toks.empty:
        return empty
    docS = pd.Series(toks.index.get_level_values(0), index=toks.index)
    text, num, op = toks[0], toks[1], toks[2]
    is_num, is_str = num.notna(), text.notna()

    # slot-merge: the k-th number/string of a doc gets slot k, so "the
    # operand(s) just before this operator" is a join on (doc, slot)
    nslot = is_num.astype("int64").groupby(docS).cumsum()
    sslot = is_str.astype("int64").groupby(docS).cumsum()
    ntab = pd.DataFrame(
        {
            "doc": docS[is_num].values,
            "slot": nslot[is_num].values,
            "v": pd.to_numeric(num[is_num]).values,
        }
    )
    stab = pd.DataFrame(
        {
            "doc": docS[is_str].values,
            "slot": sslot[is_str].values,
            # unescape \( \) \\ etc.
            "t": text[is_str].str.replace(r"\\(.)", r"\1", regex=True).values,
        }
    )

    is_tm, is_td, is_tj = (op == "Tm"), (op == "Td"), (op == "Tj")
    is_bt = op == "BT"
    is_pos = is_tm | is_td | is_bt
    if not is_tj.any():
        return empty

    # positioning state: BT resets the text matrix to identity (ISO
    # 32000 §9.4.1 — position (0,0)), Tm is absolute (operands … e f ->
    # e=x f=y, the last two numbers), Td adds (dx, dy) to the current
    # position.  reset-cumsum: each BT or Tm starts a segment; within a
    # segment the position is the anchor value plus the running Td
    # deltas.
    p = pd.DataFrame(
        {
            "doc": docS[is_pos].values,
            "slot": nslot[is_pos].values,
            "anchor": (is_tm | is_bt)[is_pos].values,
            "bt": is_bt[is_pos].values,
        },
        index=toks.index[is_pos],
    )
    p = p.merge(
        ntab.rename(columns={"v": "vy"}), on=["doc", "slot"], how="left"
    ).merge(
        ntab.assign(slot=ntab["slot"] + 1).rename(columns={"v": "vx"}),
        on=["doc", "slot"],
        how="left",
    )
    p.index = toks.index[is_pos]
    # BT carries no operands: its anchor value is the origin, not
    # whatever numbers happen to precede it
    p["vx"] = p["vx"].where(~p["bt"], 0.0)
    p["vy"] = p["vy"].where(~p["bt"], 0.0)
    seg = p["anchor"].astype("int64").groupby(p["doc"]).cumsum()
    cur_x = p["vx"].fillna(0.0).groupby([p["doc"], seg]).cumsum()
    cur_y = p["vy"].fillna(0.0).groupby([p["doc"], seg]).cumsum()

    # carry the position forward to each Tj (ffill over token order)
    posx = pd.Series(float("nan"), index=toks.index)
    posy = pd.Series(float("nan"), index=toks.index)
    posx[cur_x.index] = cur_x.values
    posy[cur_y.index] = cur_y.values
    posx = posx.groupby(docS).ffill()
    posy = posy.groupby(docS).ffill()

    tj = pd.DataFrame(
        {
            "doc": docS[is_tj].values,
            "slot": sslot[is_tj].values,
            "x": posx[is_tj].values,
            "y": posy[is_tj].values,
        }
    )
    tj = tj.merge(stab, on=["doc", "slot"], how="inner")
    if not len(tj):
        return empty
    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].values[tj["doc"].values],
            "seq": tj.groupby("doc").cumcount().astype("int32"),
            "x": tj["x"].fillna(0).round().astype("int32"),
            "y": tj["y"].fillna(0).round().astype("int32"),
            "line_text": tj["t"],
        }
    )
    return out


def parse_pdf_text_spans(df: DataFrame, *, payload_col: str = "payload") -> DataFrame:
    """(doc_id, payload:binary) -> positioned text spans
    (doc_id, seq, x, y, line_text), canonical Arrow path.

    seq is the show-order (Tj order) within the document; (x, y) is the
    text position in PDF user space (y grows UPWARD — reading order
    within a column is y DESCENDING).  Documents whose stream shows no
    text produce no rows (compose with a left join when every input
    doc must surface)."""
    src = df.select(F.col("doc_id").cast("long"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _parse_batch(pdf)

    return src.mapInPandas(run, schema=SPAN_SCHEMA)


def parse_pdf_text_spans_simple(
    df: DataFrame, *, payload_col: str = "payload"
) -> DataFrame:
    """JVM-expression twin of :func:`parse_pdf_text_spans` for the
    derived corpus's fixed block shape
    ``BT 1 0 0 1 x y Tm (l1) Tj [0 -12 Td (l2) Tj] ET``: aligned
    ``regexp_extract_all`` calls (same regex, different group) stay
    index-aligned, ``arrays_zip`` rebuilds the blocks, and each block
    flattens to one or two line spans — WholeStageCodegen, zero
    Python.  Arbitrary operator interleavings need the canonical
    path."""
    # no comment pre-strip: a '%' inside a literal string belongs to the
    # string, and the derived shape never places a comment inside BT…ET,
    # so the block regex is unaffected by comment lines between blocks
    stream = F.decode(F.coalesce(F.col(payload_col), F.lit(b"")), "UTF-8")
    block_re = (
        r"(?s)BT 1 0 0 1 (-?\d+) (-?\d+) Tm \(((?:[^()\\]|\\.)*)\) Tj"
        r"( 0 -12 Td \(((?:[^()\\]|\\.)*)\) Tj)? ET"
    )

    def grp(i: int) -> Column:
        return F.regexp_extract_all(stream, F.lit(block_re), i)

    def unescape(c: Column) -> Column:
        return F.regexp_replace(c, r"\\(.)", r"$1")

    blocks = F.arrays_zip(
        grp(1).alias("x"), grp(2).alias("y"), grp(3).alias("l1"),
        grp(4).alias("cont"), grp(5).alias("l2"),
    )
    spans = F.flatten(
        F.transform(
            blocks,
            lambda b: F.filter(
                F.array(
                    F.struct(
                        b["x"].cast("int").alias("x"),
                        b["y"].cast("int").alias("y"),
                        unescape(b["l1"]).alias("line_text"),
                    ),
                    F.struct(
                        b["x"].cast("int").alias("x"),
                        (b["y"].cast("int") - 12).alias("y"),
                        F.when(b["cont"] != "", unescape(b["l2"])).alias("line_text"),
                    ),
                ),
                lambda sp: sp["line_text"].isNotNull(),
            ),
        )
    )
    out = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(spans).alias("seq", "span"),
    )
    return out.select(
        "doc_id",
        F.col("seq").cast("int").alias("seq"),
        F.col("span.x").alias("x"),
        F.col("span.y").alias("y"),
        F.col("span.line_text").alias("line_text"),
    )


def assemble_pdf_main_text(
    docs: DataFrame, spans: DataFrame, *, column_split_x: int = 300
) -> DataFrame:
    """Compose parsed spans into per-document main text in newspaper
    reading order: left column first (x < ``column_split_x``), within a
    column top-to-bottom (y DESCENDING — PDF user space grows upward).
    Row-local sort via sort_array over collected structs — one shuffle
    (the groupBy), no per-doc window sort.  Docs with no spans surface
    with empty text via the left join against the doc list.

    Output: (doc_id, main_text, n_spans)."""
    col = F.when(F.col("x") < column_split_x, 0).otherwise(1)
    agg = (
        spans.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                col.alias("col"),
                                (-F.col("y")).alias("neg_y"),
                                F.col("seq").alias("seq"),
                                F.col("line_text").alias("line_text"),
                            )
                        )
                    ),
                    lambda sp: sp["line_text"],
                ),
                " ",
            ).alias("main_text"),
            F.count(F.lit(1)).cast("int").alias("n_spans"),
        )
    )
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("main_text", F.lit("")).alias("main_text"),
            F.coalesce("n_spans", F.lit(0)).cast("int").alias("n_spans"),
        )
    )


__all__ = [
    "parse_pdf_text_spans",
    "parse_pdf_text_spans_simple",
    "assemble_pdf_main_text",
    "SPAN_SCHEMA",
]
