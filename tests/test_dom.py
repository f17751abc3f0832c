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


# ---- link-density block classification (extract_html_dense twins) ----

from cloud_ocr_summarizer_spark.operators.dom import (  # noqa: E402
    extract_html_dense,
    extract_html_dense_simple,
)


def _run_dense(spark, fn, rows):
    df = fn(spark.createDataFrame(rows, SCHEMA))
    return {
        r["doc_id"]: (r["main_text"], r["n_tokens"], r["n_blocks"], r["n_dropped"])
        for r in df.collect()
    }


DENSE = (
    "<html><head><title>t</title></head><body>"
    '<nav><a href="#">Home</a> <a href="#">About</a></nav>'
    '<p><a href="#">all</a> <a href="#">words</a> <a href="#">linked</a></p>'
    '<p><a href="#">half here</a> and half plain</p>'
    "<p>plain prose block</p>"
    "<p></p>"
    "</body></html>"
)


def test_density_rule_boundaries_both_paths(spark):
    # block 1: 3/3 linked -> dropped; block 2: 2/5 linked -> kept;
    # block 3: 0/3 -> kept; block 4: empty (0/0) -> kept, no text.
    # nav anchors are inside a boilerplate container: never counted.
    for fn in (extract_html_dense, extract_html_dense_simple):
        out = _run_dense(spark, fn, [(1, DENSE)])
        assert out[1] == ("half here and half plain plain prose block", 8, 4, 1), (
            fn.__name__
        )


def test_density_exactly_half_is_kept(spark):
    # 2 of 4 tokens linked: 2*2 <= 4 -> kept (the boundary is inclusive)
    html = '<body><p><a href="#">one two</a> three four</p></body>'
    for fn in (extract_html_dense, extract_html_dense_simple):
        assert _run_dense(spark, fn, [(1, html)])[1] == (
            "one two three four", 4, 1, 0,
        ), fn.__name__


def test_density_majority_linked_is_dropped(spark):
    # 3 of 5 tokens linked: 2*3 > 5 -> dropped
    html = '<body><p><a href="#">one two three</a> four five</p></body>'
    for fn in (extract_html_dense, extract_html_dense_simple):
        assert _run_dense(spark, fn, [(1, html)])[1] == ("", 0, 1, 1), fn.__name__


def test_dense_null_and_blockless_input(spark):
    rows = [(1, None), (2, "no tags at all"), (3, "")]
    for fn in (extract_html_dense, extract_html_dense_simple):
        out = _run_dense(spark, fn, rows)
        # text outside any <p> block is not part of any block's density
        # decision and not emitted (the <p>-contents-only contract)
        assert out[1] == ("", 0, 0, 0) and out[2] == ("", 0, 0, 0)
        assert out[3] == ("", 0, 0, 0), fn.__name__


def test_dense_golden_equal_on_synthesized_corpus(spark):
    from cloud_ocr_summarizer_spark.datagen import derive_linked_html_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    html = derive_linked_html_from_documents(docs)
    a = sorted(map(tuple, extract_html_dense(html).collect()))
    b = sorted(map(tuple, extract_html_dense_simple(html).collect()))
    assert a == b and len(a) == 200
    # the deriver's class arithmetic guarantees some of each outcome
    dropped = sum(r[4] for r in a)
    blocks = sum(r[3] for r in a)
    assert 0 < dropped < blocks


# ---- text-density block classification (extract_html_density twins) ----

from cloud_ocr_summarizer_spark.operators.dom import (  # noqa: E402
    extract_html_density,
    extract_html_density_simple,
)


def test_textdensity_one_line_boundary_both_paths(spark):
    # 7 short words on one line: 7 >= 7*1 -> kept; 6 words -> dropped
    html = (
        "<body><p>one two three four five six seven</p>"
        "<p>one two three four five six</p></body>"
    )
    for fn in (extract_html_density, extract_html_density_simple):
        out = _run_dense(spark, fn, [(1, html)])
        assert out[1] == ("one two three four five six seven", 7, 2, 1), fn.__name__


def test_textdensity_wrapped_lines_raise_the_bar(spark):
    # 14 six-char words -> nc = 14*6+13 = 97 -> 2 lines -> need 14: kept.
    # 13 six-char words -> nc = 90 -> 2 lines -> need 14 > 13: dropped.
    w = " ".join(["sixchr"] * 14)
    v = " ".join(["sixchr"] * 13)
    html = f"<body><p>{w}</p><p>{v}</p></body>"
    for fn in (extract_html_density, extract_html_density_simple):
        out = _run_dense(spark, fn, [(1, html)])
        assert out[1] == (w, 14, 2, 1), fn.__name__


def test_textdensity_exact_80_char_line(spark):
    # 9 words, nc exactly 80 -> ceil(80/80) = 1 line -> 9 >= 7 kept;
    # one char more -> 2 lines -> 9 < 14 dropped
    base = ["abcdefg"] * 9  # 9*7 chars + 8 spaces = 71 -> pad first word
    w80 = " ".join(["abcdefghijklmnop"] + base[1:])  # 16+8*7+8 = 80
    w81 = " ".join(["abcdefghijklmnopq"] + base[1:])  # 81
    html = f"<body><p>{w80}</p><p>{w81}</p></body>"
    for fn in (extract_html_density, extract_html_density_simple):
        out = _run_dense(spark, fn, [(1, html)])
        assert out[1] == (w80, 9, 2, 1), fn.__name__


def test_textdensity_fragment_and_container_strip(spark):
    # high-density prose inside <header> never reaches a block; the
    # 2-word fragment block drops; empty block drops silently
    html = (
        "<body><header>one two three four five six seven eight</header>"
        "<p>(c) 2026</p><p></p>"
        "<p>real content sentence with exactly seven words</p></body>"
    )
    for fn in (extract_html_density, extract_html_density_simple):
        out = _run_dense(spark, fn, [(1, html)])
        assert out[1] == (
            "real content sentence with exactly seven words", 7, 3, 2,
        ), fn.__name__


def test_textdensity_null_and_blockless_input(spark):
    rows = [(1, None), (2, "free text outside blocks"), (3, "")]
    for fn in (extract_html_density, extract_html_density_simple):
        out = _run_dense(spark, fn, rows)
        assert out[1] == ("", 0, 0, 0) and out[2] == ("", 0, 0, 0)
        assert out[3] == ("", 0, 0, 0), fn.__name__


def test_textdensity_golden_equal_on_synthesized_corpus(spark):
    from cloud_ocr_summarizer_spark.datagen import derive_density_html_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    html = derive_density_html_from_documents(docs)
    a = sorted(map(tuple, extract_html_density(html).collect()))
    b = sorted(map(tuple, extract_html_density_simple(html).collect()))
    assert a == b and len(a) == 200
    dropped = sum(r[4] for r in a)
    blocks = sum(r[3] for r in a)
    assert 0 < dropped < blocks


# ---- combined Readability classifier (extract_html_classified twins) ----

from cloud_ocr_summarizer_spark.operators.dom import (  # noqa: E402
    extract_html_classified,
    extract_html_classified_simple,
)


def test_classified_both_rules_fire_independently(spark):
    # b1: 8 words, majority linked -> link rule drops (text-rich);
    # b2: 2 plain words -> text rule drops (link-free);
    # b3: 7 plain words, one line -> kept;
    # b4: 8 words, exactly half linked -> both rules pass -> kept
    html = (
        "<body>"
        '<p><a href="#">one two three four five</a> six seven eight</p>'
        "<p>(c) 2026</p>"
        "<p>one two three four five six seven</p>"
        '<p><a href="#">one two three four</a> five six seven eight</p>'
        "</body>"
    )
    for fn in (extract_html_classified, extract_html_classified_simple):
        out = _run_dense(spark, fn, [(1, html)])
        assert out[1] == (
            "one two three four five six seven "
            "one two three four five six seven eight",
            15, 4, 2,
        ), fn.__name__


def test_classified_golden_equal_and_all_classes(spark):
    from cloud_ocr_summarizer_spark.datagen import (
        derive_classified_html_from_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    html = derive_classified_html_from_documents(docs)
    a = sorted(map(tuple, extract_html_classified(html).collect()))
    b = sorted(map(tuple, extract_html_classified_simple(html).collect()))
    assert a == b and len(a) == 200
    dropped = sum(r[4] for r in a)
    blocks = sum(r[3] for r in a)
    # classes 0 (link-dense) and 2 (fragment) both drop; >= 2/5 of
    # blocks must go, and plenty must survive
    assert blocks * 2 // 5 <= dropped < blocks


def test_warc_envelope_round_trip(spark):
    """The container parser recovers every header field and the exact
    inner HTML; 404 records parse but are dropped by the composed job."""
    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.datagen import derive_html_from_documents
    from cloud_ocr_summarizer_spark.operators.warc import (
        derive_warc_records_from_documents,
        parse_warc_records,
        warc_main_text,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha bravo w{i} charlie", "srcA", "en")
         for i in (0, 1, 16, 17, 34, 35)],
        "doc_id long, text string, source string, lang string",
    )
    parsed = parse_warc_records(derive_warc_records_from_documents(docs))
    rows = {r.doc_id: r for r in parsed.collect()}
    assert set(rows) == {0, 1, 16, 17, 34, 35}
    for d, r in rows.items():
        assert r.target_uri == f"http://crawl.example/doc/{d}"
        assert r.warc_date == f"2026-01-{d % 28 + 1:02d}T00:00:00Z"
        assert r.http_status == (404 if d % 17 == 0 else 200)
        # declared Content-Length == actual HTTP message byte length
        msg = (
            ("HTTP/1.1 404 Not Found" if d % 17 == 0 else "HTTP/1.1 200 OK")
            + "\r\nContent-Type: text/html\r\n\r\n"
        )
        body = rows[d].html
        assert r.content_length == len(msg.encode()) + len(body.encode())
    # inner HTML of 200s is byte-identical to the DOM deriver's output
    expect_html = {
        r.doc_id: r.html
        for r in derive_html_from_documents(docs).collect()
    }
    for d in (1, 16, 35):
        assert rows[d].html == expect_html[d]
    assert rows[0].html == "<html><body>gone</body></html>"
    # the composed job drops the 404s
    out = warc_main_text(docs)
    kept = {r.doc_id for r in out.collect()}
    assert kept == {1, 16, 35}
    got = {r.doc_id: r.main_text for r in out.collect()}
    assert got[16] == "alpha bravo w16 charlie"


def test_warc_gzip_round_trip_lossless(spark):
    from cloud_ocr_summarizer_spark.operators.warc import (
        warc_main_text,
        warc_main_text_gz,
    )

    docs = spark.createDataFrame(
        [(i, f"word{i} text here", "s", "en") for i in range(1, 30)],
        "doc_id long, text string, source string, lang string",
    )
    plain = warc_main_text(docs)
    gz = warc_main_text_gz(docs)
    assert gz.exceptAll(plain).count() == 0
    assert plain.exceptAll(gz).count() == 0


def test_meta_robots_gate(spark):
    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.operators.dom import (
        inject_robots_noindex,
        meta_robots_gate,
    )

    html_df = spark.createDataFrame(
        [(i, "<html><head><title>t</title></head><body><p>x</p></body></html>")
         for i in range(26)],
        "doc_id long, html string",
    )
    marked = inject_robots_noindex(html_df, every=13)
    # the injected meta really is in the flagged docs' head
    flagged = marked.where(F.col("doc_id") % 13 == 0).collect()
    assert all('content="noindex"' in r.html for r in flagged)
    kept = {r.doc_id for r in meta_robots_gate(marked).select("doc_id").collect()}
    assert kept == {i for i in range(26) if i % 13 != 0}
    # case-insensitive and attribute-order tolerant
    tricky = spark.createDataFrame(
        [(1, '<head><META CONTENT="a,NOINDEX,b" NAME="robots"></head>')],
        "doc_id long, html string",
    )
    # attribute order swapped: name after content — regex keys on
    # name= then content=, so this variant is NOT caught; pin the
    # documented contract (name-then-content, any case)
    ordered = spark.createDataFrame(
        [(1, '<head><meta NAME="robots" Content="x,NoIndex"></head>'),
         (2, '<head><meta name="robots" content="index,follow"></head>')],
        "doc_id long, html string",
    )
    assert {r.doc_id for r in meta_robots_gate(ordered).collect()} == {2}
    assert meta_robots_gate(tricky).count() == 1  # documented miss


def test_warc_malformed_record_surfaces_null_not_garbage(spark):
    """A record without the CRLFCRLF envelope split parses to NULL
    body/status fields (countable) instead of garbage that the status
    filter silently drops (the audit-over-silence policy)."""
    from cloud_ocr_summarizer_spark.operators.warc import (
        parse_warc_records,
        warc_malformed_audit,
    )

    good = (
        "WARC/1.0\r\nWARC-Record-ID: <urn:doc:7>\r\n"
        "WARC-Target-URI: http://x/7\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n"
        "Content-Length: 20\r\n\r\n"
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"
    )
    no_envelope = "WARC/1.0\nWARC-Record-ID: <urn:doc:8>\nno crlfcrlf at all"
    no_http_split = (
        "WARC/1.0\r\nWARC-Record-ID: <urn:doc:9>\r\n\r\n"
        "HTTP/1.1 200 OK\r\nContent-Type: text/html"  # no header/body split
    )
    df = spark.createDataFrame(
        [(g.encode(),) for g in (good, no_envelope, no_http_split)],
        "payload binary",
    )
    rows = {r.doc_id: r for r in parse_warc_records(df).collect()}
    assert rows[7].http_status == 200 and rows[7].html == "<html>hi</html>"
    assert rows[8].http_status is None and rows[8].html is None
    assert rows[9].http_status == 200 and rows[9].html is None
    audit = warc_malformed_audit(df).collect()[0]
    assert (audit.n_records, audit.n_status_null, audit.n_html_null) == (3, 1, 2)


def test_warc_garbage_numeric_headers_null_not_crash(spark):
    """Non-numeric Content-Length, an over-bigint record id, and a
    non-numeric status line must parse as NULL fields under ANSI mode —
    one corrupt crawl record may never abort the whole job."""
    from cloud_ocr_summarizer_spark.operators.warc import parse_warc_records

    garbage = (
        "WARC/1.0\r\nWARC-Record-ID: <urn:doc:99999999999999999999999>\r\n"
        "WARC-Target-URI: http://x/g\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n"
        "Content-Length: abc\r\n\r\n"
        "HTTP/1.1 2x0 Weird\r\nContent-Type: text/html\r\n\r\n<html>g</html>"
    )
    df = spark.createDataFrame([(garbage.encode(),)], "payload binary")
    row = parse_warc_records(df).collect()[0]
    assert row.doc_id is None
    assert row.content_length is None
    assert row.http_status is None
    assert row.html == "<html>g</html>"
