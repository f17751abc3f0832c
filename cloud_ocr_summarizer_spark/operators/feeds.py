"""RSS 2.0 / Atom feed ingestion for crawl-frontier discovery.

Feeds are the third frontier-discovery channel next to sitemaps
(operators/sitemap.py) and robots.txt Sitemap pointers
(operators/robotstxt.py): hosts publish their newest URLs as RSS
``<item>`` or Atom ``<entry>`` records.  This module synthesizes both
formats per host and parses them back to normalized entry rows.

Reference tie-in: same crawl/curation tier as the sitemap and WARC
parsers — the reference (vision_processor.py:146-326) starts from
already-fetched objects; feed ingestion is upstream frontier work the
north rule adds around it.

Scale design:
  - A feed holds the newest ``max_entries`` items by protocol practice
    (readers only see the window), so the synthesis ``collect_list``
    buffer is bounded by the CAP, not by host size — hot hosts simply
    roll older entries out, exactly like the sitemap 50k shard cap.
  - Parsing is map-only (strip comments -> regexp entry scan ->
    posexplode -> per-entry field extraction); the only exchange in
    the round trip is the synthesis window + groupBy.
  - Format divergence is handled per-row: RSS carries the link as
    ELEMENT TEXT, Atom as an ``href`` ATTRIBUTE — a parser that reads
    only one convention loses half the corpus; RSS dates are RFC-822
    month names, Atom dates ISO — both normalize to one ``pub_date``.

Synthesis (datagen convention — every field re-derivable from doc_id
arithmetic, so the DuckDB twin never parses XML):
  - kind is a host-level property: hosts carry ``example-G.`` with
    G = doc_id % 10 shared by every member doc; G even -> RSS, odd ->
    Atom.
  - entries = the first ``max_entries`` docs of the host by doc_id.
  - title 'Title <d>' plus ' & more' when d % 5 == 0 (forces the
    escape path); RSS titles are CDATA-wrapped when d % 3 == 0 (raw
    ampersand inside CDATA — an entity-blind or CDATA-blind parser
    fails one branch or the other).
  - link = the canonical URL synthesis (urls.py), XML-escaped in both
    the RSS element and the Atom attribute (&amp; in ?ref= queries).
  - RSS pubDate 'Www, DD Mon 2026 00:00:00 GMT' (weekday d % 7, month
    name 1 + d % 12, day 1 + d % 28); Atom updated ISO — both must
    normalize to '2026-MM-DD'.
  - an XML comment with a decoy <item>/<entry> heads every feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.column import Column

from cloud_ocr_summarizer_spark.operators.sitemap import xml_escape, xml_unescape

FEED_MAX_ENTRIES = 4

_WEEKDAYS = ("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
_MONTHS = (
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
)


def derive_feeds_from_documents(
    docs: DataFrame,
    parsed_urls: DataFrame | None = None,
    *,
    max_entries: int = FEED_MAX_ENTRIES,
) -> DataFrame:
    """documents -> (host, feed_xml): one RSS or Atom file per host.

    The per-host window keeps the first ``max_entries`` docs by doc_id
    (the protocol's newest-items window), so the assembly buffer is
    bounded by the cap — never host-corpus-sized.
    """
    if parsed_urls is None:
        from cloud_ocr_summarizer_spark.operators.urls import (
            derive_urls_from_documents,
            parse_urls,
        )

        parsed_urls = parse_urls(derive_urls_from_documents(docs))
    d = F.col("doc_id")
    g = d % 10
    is_rss = g % 2 == 0
    rn = F.row_number().over(Window.partitionBy("host").orderBy("doc_id"))
    title_raw = F.concat(
        F.lit("Title "),
        d.cast("string"),
        F.when(d % 5 == 0, F.lit(" & more")).otherwise(F.lit("")),
    )
    title_xml = F.when(
        is_rss & (d % 3 == 0),
        F.concat(F.lit("<![CDATA["), title_raw, F.lit("]]>")),
    ).otherwise(xml_escape(title_raw))
    mm = (d % 12 + 1).cast("int")
    dd = (d % 28 + 1).cast("int")
    rfc822 = F.concat(
        F.element_at(F.array(*[F.lit(w) for w in _WEEKDAYS]), (d % 7 + 1).cast("int")),
        F.lit(", "),
        F.lpad(dd.cast("string"), 2, "0"),
        F.lit(" "),
        F.element_at(F.array(*[F.lit(m) for m in _MONTHS]), mm),
        F.lit(" 2026 00:00:00 GMT"),
    )
    iso = F.concat(
        F.lit("2026-"),
        F.lpad(mm.cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(dd.cast("string"), 2, "0"),
        F.lit("T00:00:00Z"),
    )
    guid = F.concat(F.lit("guid-"), d.cast("string"))
    rss_entry = F.concat(
        F.lit("  <item>\n    <title>"), title_xml,
        F.lit("</title>\n    <link>"), xml_escape(F.col("url")),
        F.lit("</link>\n    <guid>"), guid,
        F.lit("</guid>\n    <pubDate>"), rfc822,
        F.lit("</pubDate>\n  </item>"),
    )
    atom_entry = F.concat(
        F.lit("  <entry>\n    <title>"), title_xml,
        F.lit('</title>\n    <link href="'), xml_escape(F.col("url")),
        F.lit('"/>\n    <id>'), guid,
        F.lit("</id>\n    <updated>"), iso,
        F.lit("</updated>\n  </entry>"),
    )
    entries = (
        parsed_urls.select(
            "host",
            d.alias("doc_id"),
            F.when(is_rss, rss_entry).otherwise(atom_entry).alias("entry"),
            is_rss.alias("is_rss"),
        )
        .withColumn("rn", rn)
        .where(F.col("rn") <= max_entries)
    )
    body = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("rn", "entry"))),
            lambda s: s["entry"],
        ),
        "\n",
    )
    decoy = (
        "<!-- decoy a comment-blind parser trips on:"
        " <item><link>http://decoy.invalid/</link></item>"
        " <entry><link href=\"http://decoy.invalid/\"/></entry> -->\n"
    )
    return entries.groupBy("host").agg(
        F.when(
            F.first("is_rss"),
            F.concat(
                F.lit(
                    '<?xml version="1.0"?>\n<rss version="2.0">\n<channel>\n'
                    "<title>Feed</title>\n" + decoy
                ),
                body,
                F.lit("\n</channel>\n</rss>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit(
                    '<?xml version="1.0"?>\n'
                    '<feed xmlns="http://www.w3.org/2005/Atom">\n'
                    "<title>Feed</title>\n" + decoy
                ),
                body,
                F.lit("\n</feed>"),
            )
        )
        .alias("feed_xml")
    )


def _title_col(inner: Column) -> Column:
    """Entry title: CDATA unwrap when wrapped, entity unescape otherwise;
    NULL when absent or empty (the headmeta NULL-for-absent policy)."""
    raw = F.regexp_extract(inner, r"(?s)<title>(.*?)</title>", 1)
    cdata = F.regexp_extract(raw, r"(?s)^<!\[CDATA\[(.*)\]\]>$", 1)
    return F.nullif(
        F.when(raw.rlike(r"^<!\[CDATA\["), cdata).otherwise(xml_unescape(raw)),
        F.lit(""),
    )


def _norm_date(inner: Column) -> Column:
    """'2026-MM-DD' from either an RFC-822 pubDate or an ISO updated."""
    iso = F.regexp_extract(inner, r"<updated>(\d{4}-\d{2}-\d{2})", 1)
    day = F.regexp_extract(inner, r"<pubDate>\w+, (\d{2}) (\w{3}) (\d{4})", 1)
    mon = F.regexp_extract(inner, r"<pubDate>\w+, (\d{2}) (\w{3}) (\d{4})", 2)
    year = F.regexp_extract(inner, r"<pubDate>\w+, (\d{2}) (\w{3}) (\d{4})", 3)
    mm = F.array_position(F.array(*[F.lit(m) for m in _MONTHS]), mon).cast("int")
    rfc = F.concat(year, F.lit("-"), F.lpad(mm.cast("string"), 2, "0"), F.lit("-"), day)
    return F.when(iso != "", iso).when(mm >= 1, rfc)


def parse_feed_entries(feeds: DataFrame) -> DataFrame:
    """(host, feed_xml) -> (host, kind, pos, title, link, guid, pub_date).

    Map-only: comment strip -> entry scan -> posexplode -> field
    extraction.  The link read is format-dispatched (RSS element text
    vs Atom href attribute), titles CDATA-unwrap or entity-unescape,
    and both date dialects normalize to '2026-MM-DD'.
    """
    xml = F.regexp_replace(F.col("feed_xml"), r"(?s)<!--.*?-->", "")
    kind = F.when(xml.rlike("<rss[ >]"), F.lit("rss")).otherwise(F.lit("atom"))
    entries = F.when(
        kind == "rss", F.regexp_extract_all(xml, F.lit(r"(?s)<item>(.*?)</item>"), 1)
    ).otherwise(F.regexp_extract_all(xml, F.lit(r"(?s)<entry>(.*?)</entry>"), 1))
    e = feeds.select("host", kind.alias("kind"), entries.alias("entries")).select(
        "host", "kind", F.posexplode("entries").alias("pos0", "inner")
    )
    inner = F.col("inner")
    link = F.nullif(
        F.when(
            F.col("kind") == "rss",
            xml_unescape(F.regexp_extract(inner, r"(?s)<link>(.*?)</link>", 1)),
        ).otherwise(
            xml_unescape(
                F.regexp_extract(inner, r'''<link href=["']([^"']*)["']''', 1)
            )
        ),
        F.lit(""),
    )
    guid = F.coalesce(
        F.nullif(F.regexp_extract(inner, r"<guid>(.*?)</guid>", 1), F.lit("")),
        F.nullif(F.regexp_extract(inner, r"<id>(.*?)</id>", 1), F.lit("")),
    )
    return e.select(
        "host",
        "kind",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        _title_col(inner).alias("title"),
        link.alias("link"),
        guid.alias("guid"),
        _norm_date(inner).alias("pub_date"),
    )


def latest_entry_per_host(entries: DataFrame) -> DataFrame:
    """Newest entry per host (pub_date DESC, guid ASC tiebreak).

    The recrawl-planner primitive: one ranked window over the already
    cap-bounded entry rows."""
    w = Window.partitionBy("host").orderBy(
        F.col("pub_date").desc(), F.col("guid").asc()
    )
    return (
        entries.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("host", "kind", "title", "link", "guid", "pub_date")
    )
