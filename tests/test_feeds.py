"""RSS/Atom feeds: format dispatch, CDATA/entity titles, date dialects."""

from pyspark.sql import functions as F

from cloud_ocr_summarizer_spark.operators.feeds import (
    derive_feeds_from_documents,
    latest_entry_per_host,
    parse_feed_entries,
)


def _docs(spark, n=30):
    return spark.createDataFrame(
        [(i, f"t{i}", f"src{i % 2}", ["en", "de"][i % 2]) for i in range(n)],
        "doc_id long, text string, source string, lang string",
    )


def _feed(spark, xml):
    return spark.createDataFrame([("h", xml)], "host string, feed_xml string")


def test_rss_link_is_element_text_atom_is_href(spark):
    rss = (
        '<rss version="2.0"><channel><item><title>a</title>'
        "<link>http://h/rss?a=1&amp;b=2</link><guid>g1</guid>"
        "<pubDate>Tue, 03 Feb 2026 00:00:00 GMT</pubDate></item></channel></rss>"
    )
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><entry><title>b</title>'
        '<link href="http://h/atom?a=1&amp;b=2"/><id>g2</id>'
        "<updated>2026-02-03T00:00:00Z</updated></entry></feed>"
    )
    rows = {r.guid: r for r in parse_feed_entries(_feed(spark, rss)).collect()}
    rows.update(
        {r.guid: r for r in parse_feed_entries(_feed(spark, atom)).collect()}
    )
    assert rows["g1"].kind == "rss" and rows["g1"].link == "http://h/rss?a=1&b=2"
    assert rows["g2"].kind == "atom" and rows["g2"].link == "http://h/atom?a=1&b=2"
    assert rows["g1"].pub_date == "2026-02-03" == rows["g2"].pub_date


def test_cdata_title_keeps_raw_ampersand(spark):
    xml = (
        '<rss version="2.0"><channel>'
        "<item><title><![CDATA[A & B <raw>]]></title><link>http://x/1</link>"
        "<guid>g1</guid><pubDate>Mon, 01 Jan 2026 00:00:00 GMT</pubDate></item>"
        "<item><title>A &amp; B &lt;esc&gt;</title><link>http://x/2</link>"
        "<guid>g2</guid><pubDate>Mon, 01 Jan 2026 00:00:00 GMT</pubDate></item>"
        "</channel></rss>"
    )
    rows = {r.guid: r for r in parse_feed_entries(_feed(spark, xml)).collect()}
    assert rows["g1"].title == "A & B <raw>"
    assert rows["g2"].title == "A & B <esc>"


def test_comment_decoy_not_parsed(spark):
    xml = (
        '<rss version="2.0"><channel>'
        "<!-- <item><link>http://decoy/</link><guid>gx</guid></item> -->"
        "<item><title>t</title><link>http://real/</link><guid>g</guid>"
        "<pubDate>Mon, 05 Mar 2026 00:00:00 GMT</pubDate></item></channel></rss>"
    )
    rows = parse_feed_entries(_feed(spark, xml)).collect()
    assert [r.link for r in rows] == ["http://real/"]


def test_newest_window_caps_entries_per_host(spark):
    feeds = derive_feeds_from_documents(_docs(spark, 30), max_entries=2)
    sizes = (
        parse_feed_entries(feeds).groupBy("host").count().agg(F.max("count")).first()[0]
    )
    assert sizes <= 2


def test_latest_per_host_orders_by_date_then_guid(spark):
    entries = spark.createDataFrame(
        [
            ("h", "rss", 1, "t1", "l1", "guid-1", "2026-03-01"),
            ("h", "rss", 2, "t2", "l2", "guid-2", "2026-05-01"),
            ("h", "rss", 3, "t3", "l3", "guid-3", "2026-05-01"),
        ],
        "host string, kind string, pos int, title string, link string,"
        " guid string, pub_date string",
    )
    row = latest_entry_per_host(entries).first()
    assert row.guid == "guid-2" and row.pub_date == "2026-05-01"


def test_partitioning_invariance(spark):
    docs = _docs(spark, 40)
    a = sorted(
        map(tuple, parse_feed_entries(derive_feeds_from_documents(docs)).collect())
    )
    b = sorted(
        map(
            tuple,
            parse_feed_entries(
                derive_feeds_from_documents(docs.repartition(11, "source"))
            ).collect(),
        )
    )
    assert a == b
