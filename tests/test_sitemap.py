"""Sitemap XML: shard synthesis round trip, decoy/escaping traps, caps."""

from pyspark.sql import functions as F

from cloud_ocr_summarizer_spark.operators.sitemap import (
    derive_sitemap_index,
    derive_sitemap_xml_from_documents,
    parse_sitemap_index,
    parse_sitemap_urls,
)


def _docs(spark, n=20):
    return spark.createDataFrame(
        [(i, f"t{i}", f"src{i % 2}", ["en", "de"][i % 2]) for i in range(n)],
        "doc_id long, text string, source string, lang string",
    )


def test_comment_decoy_not_parsed(spark):
    sm = spark.createDataFrame(
        [
            (
                "h",
                0,
                '<urlset><!-- <url><loc>http://decoy/</loc></url> -->'
                "<url><loc>http://real/a</loc></url></urlset>",
            )
        ],
        "host string, shard_id int, sitemap_xml string",
    )
    rows = parse_sitemap_urls(sm).collect()
    assert [r.loc for r in rows] == ["http://real/a"]


def test_entity_unescape_and_optional_fields(spark):
    sm = spark.createDataFrame(
        [
            (
                "h",
                0,
                "<urlset><url><loc>http://h/?a=1&amp;b=&lt;2&gt;</loc>"
                "<lastmod>2026-02-03</lastmod><priority>0.7</priority></url>"
                "<url><loc>http://h/x</loc></url></urlset>",
            )
        ],
        "host string, shard_id int, sitemap_xml string",
    )
    rows = parse_sitemap_urls(sm).orderBy("pos").collect()
    assert rows[0].loc == "http://h/?a=1&b=<2>"
    assert rows[0].lastmod == "2026-02-03"
    assert rows[0].priority_milli == 700
    assert rows[1].lastmod is None and rows[1].priority_milli is None


def test_shard_cap_bounds_every_file(spark):
    shards = derive_sitemap_xml_from_documents(_docs(spark, 40), max_urls=3)
    sizes = (
        parse_sitemap_urls(shards)
        .groupBy("host", "shard_id")
        .count()
        .collect()
    )
    assert sizes and all(r["count"] <= 3 for r in sizes)
    # shards are dense from 0 per host
    per_host = {}
    for r in sizes:
        per_host.setdefault(r.host, []).append(r.shard_id)
    for ids in per_host.values():
        assert sorted(ids) == list(range(len(ids)))


def test_round_trip_matches_urls_in_doc_id_order(spark):
    from cloud_ocr_summarizer_spark.operators.urls import (
        derive_urls_from_documents,
        parse_urls,
    )

    docs = _docs(spark, 30)
    parsed_urls = parse_urls(derive_urls_from_documents(docs))
    expected = {}
    for r in parsed_urls.select("host", "doc_id", "url").collect():
        suffix = "&src=sm" if r.doc_id % 3 == 0 else ""
        expected.setdefault(r.host, []).append((r.doc_id, r.url + suffix))
    got = (
        parse_sitemap_urls(
            derive_sitemap_xml_from_documents(docs, max_urls=4)
        )
        .orderBy("host", "shard_id", "pos")
        .collect()
    )
    got_by_host = {}
    for r in got:
        got_by_host.setdefault(r.host, []).append(r.loc)
    assert got_by_host == {
        h: [u for _, u in sorted(v)] for h, v in expected.items()
    }


def test_index_round_trip_counts_shards(spark):
    docs = _docs(spark, 40)
    shards = derive_sitemap_xml_from_documents(docs, max_urls=3)
    n_shards = {
        (r.host, r.shard_id)
        for r in shards.select("host", "shard_id").collect()
    }
    idx = parse_sitemap_index(derive_sitemap_index(shards)).collect()
    assert {(r.host, r.shard_id) for r in idx} == n_shards
    for r in idx:
        assert r.shard_loc == f"https://{r.host}/sitemap-{r.shard_id}.xml"


def test_partitioning_invariance(spark):
    docs = _docs(spark, 30)
    a = sorted(
        map(
            tuple,
            parse_sitemap_urls(
                derive_sitemap_xml_from_documents(docs, max_urls=3)
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            parse_sitemap_urls(
                derive_sitemap_xml_from_documents(
                    docs.repartition(7), max_urls=3
                )
            ).collect(),
        )
    )
    assert a == b


def test_recrawl_schedule_join_and_staleness_rules(spark):
    from cloud_ocr_summarizer_spark.operators.sitemap import (
        recrawl_schedule,
    )

    entries = spark.createDataFrame(
        [
            # newer lastmod than ledger -> stale
            ("h.com", 0, 1, "http://h.com/a.html?x=1&src=sm", "2026-06-01", None),
            # older lastmod -> fresh (tracking param must not break the join)
            ("h.com", 0, 2, "http://h.com/b.html?ref=1&src=sm", "2026-01-01", None),
            # missing lastmod -> stale
            ("h.com", 0, 3, "http://h.com/c.html", None, None),
            # no ledger row -> stale (never fetched)
            ("h.com", 0, 4, "http://h.com/new.html", "2026-01-01", None),
        ],
        "host string, shard_id int, pos int, loc string, lastmod string,"
        " priority_milli int",
    )
    state = spark.createDataFrame(
        [
            ("http://h.com/a.html", "2026-03-01"),
            ("http://h.com/b.html", "2026-03-01"),
            ("http://h.com/c.html", "2026-03-01"),
        ],
        "url string, last_crawl string",
    )
    rows = recrawl_schedule(entries, state).collect()
    assert len(rows) == 1
    assert rows[0].n_urls == 4 and rows[0].n_stale == 3


def test_malformed_tail_is_counted_not_silent(spark):
    from cloud_ocr_summarizer_spark.operators.sitemap import (
        parse_sitemap_urls,
        sitemap_parse_audit,
    )

    xml_ok = (
        "<urlset><!-- decoy <loc> in comment -->"
        "<url><loc>http://h/a</loc></url>"
        "<url><loc>http://h/b</loc></url></urlset>"
    )
    xml_broken = (
        "<urlset><url><loc>http://h/a</loc></url>"
        "<url><loc>http://h/trunc</loc>\n  </urlset>"
    )
    sm = spark.createDataFrame(
        [("ok", 0, xml_ok), ("bad", 0, xml_broken)],
        "host string, shard_id int, sitemap_xml string",
    )
    audit = {r.host: r for r in sitemap_parse_audit(sm).collect()}
    assert (audit["ok"].n_locs, audit["ok"].n_parsed, audit["ok"].n_dropped) == (2, 2, 0)
    assert (audit["bad"].n_locs, audit["bad"].n_parsed, audit["bad"].n_dropped) == (2, 1, 1)
    parsed = parse_sitemap_urls(sm.filter("host = 'bad'")).collect()
    assert [r.loc for r in parsed] == ["http://h/a"]


def test_corruption_predicate_drops_exactly_one_tail_entry(spark):
    from cloud_ocr_summarizer_spark.operators.sitemap import (
        derive_corrupted_sitemap_shards,
        derive_sitemap_xml_from_documents,
        parse_sitemap_urls,
    )

    docs = _docs(spark, 40)
    clean = parse_sitemap_urls(
        derive_sitemap_xml_from_documents(docs, max_urls=3)
    )
    corrupted = parse_sitemap_urls(
        derive_corrupted_sitemap_shards(docs, max_urls=3)
    )
    n_corrupt_shards = (
        derive_sitemap_xml_from_documents(docs, max_urls=3)
        .filter("(length(host) + shard_id) % 3 = 0")
        .count()
    )
    assert n_corrupt_shards > 0
    assert clean.count() - corrupted.count() == n_corrupt_shards
