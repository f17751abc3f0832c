"""C4 line cleaning: rule order, page-level drops, mass balance."""

from pyspark.sql import functions as F

from cloud_ocr_summarizer_spark.operators.linesclean import (
    c4_line_audit,
    c4_line_filter,
    derive_noisy_lines_from_documents,
)


def _page(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_rule_order_first_match_wins(spark):
    # a line that is blockworded AND braced AND unterminated counts
    # under blockword only (pinned order)
    row = c4_line_filter(
        _page(spark, "enable javascript { now\nGood sentence with five words here.")
    ).first()
    assert row.n_blockword == 1 and row.n_brace == 0 and row.n_no_terminal == 0
    assert row.n_kept == 1 and row.clean_text == "Good sentence with five words here."


def test_terminal_punctuation_variants(spark):
    text = (
        'He said "stop!"\n'
        "Is this kept as a question?\n"
        "ends with comma, so it drops,\n"
        "Two words.\n"
    )
    row = c4_line_filter(_page(spark, text), min_words=3).first()
    # trailing newline yields an empty final line -> no_terminal
    assert row.n_kept == 2
    assert row.n_no_terminal == 2  # comma line + empty trailing line
    assert row.n_few_words == 1


def test_lorem_ipsum_drops_the_page_not_the_rows(spark):
    df = c4_line_filter(
        _page(spark, "A perfectly fine sentence stands here.\nLorem Ipsum dolor sit amet.")
    )
    row = df.first()
    assert row.doc_kept is False and row.n_kept == 1
    assert df.count() == 1  # flagged, not filtered out


def test_min_kept_lines_gate(spark):
    docs = _page(spark, "no terminal punctuation line here at all")
    assert c4_line_filter(docs).first().doc_kept is False


def test_synthesis_hits_every_rule_and_balances(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(60)], "doc_id long, text string"
    )
    audit = c4_line_audit(
        c4_line_filter(derive_noisy_lines_from_documents(docs))
    ).first()
    assert audit.n_docs == 60
    parts = (
        audit.lines_kept
        + audit.lines_blockword
        + audit.lines_brace
        + audit.lines_no_terminal
        + audit.lines_few_words
    )
    assert parts == audit.lines_in  # every line accounted once
    for c in ("lines_blockword", "lines_brace", "lines_no_terminal", "lines_few_words"):
        assert audit[c] > 0
    assert 0 < audit.n_docs_kept < 60


def test_partitioning_invariance(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(40)], "doc_id long, text string"
    )
    pages = derive_noisy_lines_from_documents(docs)
    a = sorted(map(tuple, c4_line_filter(pages).collect()))
    b = sorted(map(tuple, c4_line_filter(pages.repartition(13)).collect()))
    assert a == b
