"""Head metadata: scoping, decoys, attribute forms, canonical clusters."""

from cloud_ocr_summarizer_spark.operators.headmeta import (
    canonical_clusters,
    derive_head_html_from_documents,
    extract_head_meta,
)


def _docs(spark, n=30):
    return spark.createDataFrame(
        [(i, f"t{i}", f"src{i % 2}", ["en", "de"][i % 2]) for i in range(n)],
        "doc_id long, text string, source string, lang string",
    )


def _page(spark, html):
    return spark.createDataFrame([(0, "u0", html)], "doc_id long, url string, html string")


def test_head_scoped_and_comment_safe(spark):
    html = (
        "<html><head><!-- <title>Decoy comment</title> -->"
        "<title>Real &amp; true</title></head>"
        "<body><title>Decoy body</title></body></html>"
    )
    row = extract_head_meta(_page(spark, html)).first()
    assert row.title == "Real & true"


def test_attribute_order_and_quote_styles(spark):
    for tag in (
        '<meta name="description" content="D">',
        '<meta content="D" name="description">',
        "<meta name='description' content='D'>",
    ):
        row = extract_head_meta(
            _page(spark, f"<html><head>{tag}</head><body/></html>")
        ).first()
        assert row.description == "D", tag


def test_absent_fields_are_null_not_empty(spark):
    row = extract_head_meta(
        _page(spark, "<html><head><title>t</title></head><body/></html>")
    ).first()
    assert row.description is None and row.og_title is None
    assert row.canonical_url is None and row.charset is None


def test_canonical_href_unescaped(spark):
    html = (
        "<html><head>"
        '<link rel="canonical" href="http://h/x?a=1&amp;b=2">'
        "</head><body/></html>"
    )
    row = extract_head_meta(_page(spark, html)).first()
    assert row.canonical_url == "http://h/x?a=1&b=2"


def test_clusters_group_declared_duplicates(spark):
    docs = _docs(spark, 36)
    meta = extract_head_meta(derive_head_html_from_documents(docs))
    by_id = {r.doc_id: r for r in meta.collect()}
    # d % 6 == 2 declares its predecessor's URL canonical
    assert by_id[8].canonical_url == by_id[7].url
    clusters = {r.cluster_url: r for r in canonical_clusters(meta).collect()}
    c = clusters[by_id[7].url]
    assert c.n_docs == 2 and c.rep_doc_id == 7 and c.n_self == 1


def test_partitioning_invariance(spark):
    docs = _docs(spark, 40)
    a = sorted(
        map(tuple, extract_head_meta(derive_head_html_from_documents(docs)).collect())
    )
    b = sorted(
        map(
            tuple,
            extract_head_meta(
                derive_head_html_from_documents(docs.repartition(9, "lang"))
            ).collect(),
        )
    )
    assert a == b
