"""Deep-tree hierarchy flatten: the reference's full 4-level nested walk
(pages -> blocks -> paragraphs -> words -> symbols) as a Spark operator.

The reference's detailed mode builds a document as nested loops over
``response -> pages -> blocks -> paragraphs -> words -> symbols``
(`/root/reference/src/processors/vision_processor.py:226-269`, helpers
``_process_block`` :279-326, ``_process_paragraph`` :328-364,
``_process_word`` :366-402) and assembles text bottom-up:

* symbols concatenate with NO separator into a word          (:393-400)
* words join with ``' '`` into a paragraph, then ``strip()`` (:356-363)
* paragraphs join with ``'\n'`` into a block, then ``strip()`` (:316-325)
* page numbers are 1-based ARRIVAL order (list position)     (:241)

The engine's flagship input is the 1-level ``spans`` flattening of that
tree (SURVEY §1.4); THIS module handles genuinely nested input:

* ``extract_deep_tree``       — chained ``posexplode`` down to block rows
                                (pages, then blocks: the two levels that
                                multiply row counts), with the inner
                                paragraph/word/symbol assembly done
                                row-locally by JVM higher-order functions
                                — zero Python, zero extra shuffles.
* ``extract_deep_tree_arrow`` — mapInPandas twin: the whole tree walk in
                                one Arrow batch pass (the shape a real
                                OCR-response parser would take).
* ``derive_deep_tree_from_documents`` — deterministic, SQL-mirrorable
                                deep-tree builder over the flat driver
                                ``documents`` table (words -> chars as
                                symbols; 4 words/paragraph, 3 paragraphs/
                                block, 2 blocks/page), kept in lockstep
                                with oracles.ORACLES["extract_deep_tree"].

Both extractors emit identical rows, golden-checked against the
pure-Python reference walk in ``oracle.deep_tree_blocks``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tree fan-out of the synthetic deriver (mirrored in the DuckDB oracle)
WORDS_PER_PARAGRAPH = 4
PARAGRAPHS_PER_BLOCK = 3
BLOCKS_PER_PAGE = 2

DEEP_TREE_SCHEMA = (
    "array<struct<blocks:array<struct<block_type:string,"
    "paragraphs:array<struct<words:array<struct<symbols:array<string>>>>>>>>>"
)

# The engine's whitespace contract is ASCII (Java \s = [ \t\n\x0b\f\r],
# functions/text.py module caveat); every Python-side strip in this
# module must use THIS set, not bare str.strip() (which also eats
# Unicode whitespace and would desync from the JVM twin).
_ASCII_WS = " \t\n\x0b\f\r"


def _strip_ws(text: Column) -> Column:
    """Python ``str.strip()`` twin for the ASCII-whitespace contract
    (functions/text.py module caveat)."""
    return F.regexp_replace(text, r"^\s+|\s+$", "")


def assemble_block_text_col(paragraphs: Column) -> Column:
    """Bottom-up block text from a ``paragraphs`` array column, exactly
    the reference separators/strip points (vision_processor.py:316-400):
    symbols + '' -> word; words + ' ' + strip -> paragraph; paragraphs +
    '\\n' + strip -> block."""
    para_text = lambda p: _strip_ws(  # noqa: E731
        F.array_join(
            F.transform(p["words"], lambda w: F.array_join(w["symbols"], "")),
            " ",
        )
    )
    return _strip_ws(F.array_join(F.transform(paragraphs, para_text), "\n"))


def extract_deep_tree(tree: DataFrame) -> DataFrame:
    """(doc_id, pages) deep tree -> one row per block:
    (doc_id, page_number, block_seq, kind, text).

    Chained explode ONLY for the levels that become rows (pages, blocks);
    paragraph/word/symbol assembly stays inside the block row as
    higher-order functions, so the physical plan is scan -> generate ->
    generate -> project — row-local, no shuffle, and the inner arrays
    never materialize as rows (a 4-deep full explode would multiply the
    row count by words*symbols only to re-aggregate it back).
    page_number/block_seq are 1-based positional arrival order (:241).
    """
    pages = tree.select(
        "doc_id", F.posexplode("pages").alias("page_idx", "page")
    )
    blocks = pages.select(
        "doc_id",
        (F.col("page_idx") + 1).cast("int").alias("page_number"),
        F.posexplode("page.blocks").alias("block_idx", "block"),
    )
    return blocks.select(
        "doc_id",
        "page_number",
        (F.col("block_idx") + 1).cast("int").alias("block_seq"),
        F.col("block.block_type").alias("kind"),
        assemble_block_text_col(F.col("block.paragraphs")).alias("text"),
    )


def extract_deep_tree_arrow(tree: DataFrame) -> DataFrame:
    """mapInArrow twin of ``extract_deep_tree``: the full tree walk in
    one Arrow pass (scan -> mapInArrow, no shuffle).  Per batch the walk
    is plain nested iteration over ``to_pylist()`` values — the same
    loops as the reference (:226-269), amortized over Arrow batches
    instead of one process per document.

    Deliberately Arrow-native, not mapInPandas: pyarrow's pandas
    conversion of a 4-deep list<struct<list<struct<...>>>> column is
    where the sibling pandas prototype corrupted rows and crashed
    workers (zero-copy nested ndarray views); ``to_pylist`` is the
    documented-safe materialization for deeply nested values."""
    import pyarrow as pa

    id_field = tree.schema["doc_id"].dataType.simpleString()
    id_pa = {"string": pa.string(), "bigint": pa.int64(), "int": pa.int32()}[
        id_field
    ]

    def run(batches):
        for batch in batches:
            ids = batch.column("doc_id").to_pylist()
            trees = batch.column("pages").to_pylist()
            out_doc, out_page, out_seq, out_kind, out_text = [], [], [], [], []
            for doc_id, pages in zip(ids, trees):
                for page_idx, page in enumerate(pages or []):
                    if page is None:
                        # JVM twin: page.blocks -> NULL, posexplode(NULL)
                        # emits no rows
                        continue
                    for block_idx, block in enumerate(page["blocks"] or []):
                        if block is None:
                            # JVM twin EMITS the row: block.block_type
                            # and the assembled text are both NULL
                            out_doc.append(doc_id)
                            out_page.append(page_idx + 1)
                            out_seq.append(block_idx + 1)
                            out_kind.append(None)
                            out_text.append(None)
                            continue
                        if block["paragraphs"] is None:
                            # array_join(transform(NULL,…)) -> NULL text
                            text = None
                        else:
                            paras = []
                            for para in block["paragraphs"]:
                                if para is None or para["words"] is None:
                                    # NULL para_text: array_join SKIPS it
                                    continue
                                words = [
                                    "".join(
                                        s for s in w["symbols"] if s is not None
                                    )
                                    for w in para["words"]
                                    # NULL word_text: array_join skips
                                    if w is not None and w["symbols"] is not None
                                ]
                                # ASCII strip, matching the JVM twin's
                                # Java \s — bare str.strip() also eats
                                # Unicode whitespace (NBSP, U+2028, ...)
                                # and would desync the two extractors
                                paras.append(" ".join(words).strip(_ASCII_WS))
                            text = "\n".join(paras).strip(_ASCII_WS)
                        out_doc.append(doc_id)
                        out_page.append(page_idx + 1)
                        out_seq.append(block_idx + 1)
                        out_kind.append(block["block_type"])
                        out_text.append(text)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_doc, type=id_pa),
                    pa.array(out_page, type=pa.int32()),
                    pa.array(out_seq, type=pa.int32()),
                    pa.array(out_kind, type=pa.string()),
                    pa.array(out_text, type=pa.string()),
                ],
                names=["doc_id", "page_number", "block_seq", "kind", "text"],
            )

    return tree.mapInArrow(
        run,
        schema=(
            f"doc_id {id_field}, page_number int, block_seq int, "
            "kind string, text string"
        ),
    )


def derive_deep_tree_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> (doc_id, pages) deep tree.

    Deterministic: word i of the whitespace-split text goes to paragraph
    i div 4; paragraph p to block p div 3; block b to page b div 2; a
    word's symbols are its characters, so the bottom-up assembly
    reconstructs the words exactly.  block_type = TABLE iff
    (doc_id*13 + b) % 7 == 3 else TEXT.  Mirrored 1:1 by
    oracles.ORACLES["extract_deep_tree"] — keep in lockstep.
    """
    from cloud_ocr_summarizer_spark.functions.text import whitespace_tokens_col

    d = F.col("doc_id")
    words = whitespace_tokens_col(F.col("text"))
    n_words = F.size(words)
    n_paras = F.ceil(n_words / F.lit(WORDS_PER_PARAGRAPH)).cast("int")
    n_blocks = F.ceil(n_paras / F.lit(PARAGRAPHS_PER_BLOCK)).cast("int")
    n_pages = F.ceil(n_blocks / F.lit(BLOCKS_PER_PAGE)).cast("int")

    def word_struct(i: Column) -> Column:
        w = F.element_at(words, i.cast("int") + 1)
        symbols = F.transform(
            F.sequence(F.lit(1), F.length(w)), lambda j: w.substr(j, F.lit(1))
        )
        return F.struct(symbols.alias("symbols"))

    def para_struct(p: Column) -> Column:
        lo = p.cast("int") * WORDS_PER_PARAGRAPH
        hi = F.least(lo + WORDS_PER_PARAGRAPH, n_words)
        ws = F.transform(F.sequence(lo, hi - 1), word_struct)
        return F.struct(ws.alias("words"))

    def block_struct(b: Column) -> Column:
        lo = b.cast("int") * PARAGRAPHS_PER_BLOCK
        hi = F.least(lo + PARAGRAPHS_PER_BLOCK, n_paras)
        ps = F.transform(F.sequence(lo, hi - 1), para_struct)
        kind = F.when(
            F.pmod(d * 13 + b, F.lit(7)) == 3, F.lit("TABLE")
        ).otherwise(F.lit("TEXT"))
        return F.struct(kind.alias("block_type"), ps.alias("paragraphs"))

    def page_struct(g: Column) -> Column:
        lo = g.cast("int") * BLOCKS_PER_PAGE
        hi = F.least(lo + BLOCKS_PER_PAGE, n_blocks)
        bs = F.transform(F.sequence(lo, hi - 1), block_struct)
        return F.struct(bs.alias("blocks"))

    pages = F.when(
        n_pages > 0,
        F.transform(F.sequence(F.lit(0).cast("int"), n_pages - 1), page_struct),
    ).otherwise(F.array().cast(DEEP_TREE_SCHEMA))
    return docs.select(d.alias("doc_id"), pages.alias("pages"))
