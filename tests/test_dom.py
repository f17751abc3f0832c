"""HTML DOM tokenize + boilerplate strip (operators/dom.py)."""

from pyspark.sql import types as T

from cloud_ocr_summarizer_spark.operators.dom import (
    extract_html_main,
    extract_html_main_simple,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("html", T.StringType()),
    ]
)


def _run(spark, fn, rows):
    df = fn(spark.createDataFrame(rows, SCHEMA))
    return {r["doc_id"]: (r["main_text"], r["n_tokens"]) for r in df.collect()}


BASIC = (
    '<html><head><title>T</title><script>var x = 1 < 2;</script></head>'
    '<body><nav><a href="http://n">Home</a></nav>'
    '<!-- note --><div class="a"><p>hello   brave</p>'
    '<aside>ads</aside><p>new\nworld</p><br/></div>'
    '<footer>bye</footer></body></html>'
)


def test_strip_basic_both_paths(spark):
    rows = [(1, BASIC), (2, None), (3, ""), (4, "plain text, no tags")]
    for fn in (extract_html_main, extract_html_main_simple):
        out = _run(spark, fn, rows)
        assert out[1] == ("hello brave new world", 4), fn.__name__
        assert out[2] == ("", 0) and out[3] == ("", 0)
        assert out[4] == ("plain text, no tags", 4)


def test_stray_lt_inside_script(spark):
    # the '<' in '1 < 2' is inside <script>: dropped by containment on the
    # token path and by the container regex on the JVM path
    html = "<body><script>if (a < b) {}</script><p>kept</p></body>"
    for fn in (extract_html_main, extract_html_main_simple):
        assert _run(spark, fn, [(1, html)])[1] == ("kept", 1), fn.__name__


def test_nested_container_canonical_only(spark):
    # <aside> inside <aside>: the depth counter keeps counting; the
    # non-greedy regex stops at the FIRST </aside> (documented limitation)
    html = (
        "<body><p>before</p>"
        "<aside>outer <aside>inner</aside> trailing</aside>"
        "<p>after</p></body>"
    )
    assert _run(spark, extract_html_main, [(1, html)])[1] == ("before after", 2)
    leaked, _ = _run(spark, extract_html_main_simple, [(1, html)])[1]
    assert "trailing" in leaked  # the honest divergence, pinned


def test_header_regex_does_not_eat_head_close(spark):
    # '<head...' must not match the 'header' strip nor vice versa
    html = "<head><title>t</title></head><body><header>h</header><p>ok</p></body>"
    for fn in (extract_html_main, extract_html_main_simple):
        assert _run(spark, fn, [(1, html)])[1] == ("ok", 1), fn.__name__


def test_golden_equal_on_synthesized_corpus(spark):
    from cloud_ocr_summarizer_spark.datagen import derive_html_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    html = derive_html_from_documents(docs)
    a = sorted(map(tuple, extract_html_main(html).collect()))
    b = sorted(map(tuple, extract_html_main_simple(html).collect()))
    assert a == b and len(a) == 200


def test_empty_input(spark):
    empty = spark.createDataFrame([], SCHEMA)
    assert extract_html_main(empty).count() == 0
    assert extract_html_main_simple(empty).count() == 0
