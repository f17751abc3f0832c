"""URL synthesis/parse round trip + domain blocklist gate."""

from pyspark.sql import functions as F

from cloud_ocr_summarizer_spark.operators.urls import (
    BLOCKED_DOMAINS,
    derive_urls_from_documents,
    domain_gate,
    parse_urls,
)


def _docs(spark):
    rows = [
        (0, "src0", "en"),   # https (0%4), port (0%5), query (0%3)
        (1, "src1", "de"),   # http, no port, no query
        (3, "src3", "zh"),   # query only; 3%11==3 -> co.uk PSL branch
        (5, "src5", "fr"),   # port only
        (7, "src7", "en"),   # 7%11==7 -> com.au PSL branch
        (8, "src8", "xx"),   # unknown lang -> .org tld
        (12, "src12", "es"),  # https + query
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, lang string")


def test_parse_inverts_synthesis(spark):
    parsed = parse_urls(derive_urls_from_documents(_docs(spark)))
    rows = {r.doc_id: r for r in parsed.collect()}

    r0 = rows[0]
    assert r0.scheme == "https" and r0.port == 8080
    assert r0.host == "src0-en.example-0.com"
    assert r0.path == "/en/doc-0.html" and r0.query_string == "ref=0"
    assert r0.domain == "example-0.com"
    assert r0.url == "https://src0-en.example-0.com:8080/en/doc-0.html?ref=0"

    r1 = rows[1]
    assert r1.scheme == "http" and r1.port is None
    assert r1.query_string is None
    assert r1.domain == "example-1.de"

    assert rows[3].query_string == "ref=3" and rows[3].port is None
    assert rows[5].port == 8080 and rows[5].query_string is None
    # multi-label public suffixes: registered domain is THREE labels
    assert rows[3].host == "src3-zh.example-3.co.uk"
    assert rows[3].domain == "example-3.co.uk"
    assert rows[7].host == "src7-en.example-7.com.au"
    assert rows[7].domain == "example-7.com.au"
    assert rows[8].host.endswith(".org")
    assert rows[8].domain == "example-8.org"
    assert rows[12].scheme == "https" and rows[12].query_string == "ref=5"


def test_registered_domain_psl_forms(spark):
    from cloud_ocr_summarizer_spark.operators.urls import registered_domain_col

    cases = [
        ("a.b.foo.co.uk", "foo.co.uk"),      # deep subdomain under PSL
        ("www.shop.com.au", "shop.com.au"),  # classic com.au
        ("x.y.example.com", "example.com"),  # plain gTLD -> two labels
        ("example.de", "example.de"),        # already registered domain
        ("co.uk", "co.uk"),                  # bare suffix degenerates
        ("news.co.jp", "news.co.jp"),        # exactly 3 labels under PSL
        ("deep.sub.gob.mx", "sub.gob.mx"),
        ("plain.org", "plain.org"),
        # uppercase crawl noise: the suffix match is case-insensitive
        # (a case-sensitive isin would degrade FOO.CO.UK to 'CO.UK'),
        # while the returned labels keep the host's own casing
        ("FOO.CO.UK", "FOO.CO.UK"),
        ("A.B.Shop.Com.Au", "Shop.Com.Au"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [
        r.d
        for r in df.select(
            registered_domain_col(F.col("host")).alias("d")
        ).collect()
    ]
    assert got == [d for _, d in cases]


def test_domain_gate_drops_blocklisted(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i}", "en") for i in range(40)],
        "doc_id long, source string, lang string",
    )
    parsed = parse_urls(derive_urls_from_documents(docs))
    kept = domain_gate(parsed, spark)
    kept_domains = {r.domain for r in kept.select("domain").distinct().collect()}
    assert kept_domains.isdisjoint(set(BLOCKED_DOMAINS))
    # example-2.com = en docs with id%10==2 -> ids 2,12,22,32 exist
    assert parsed.where(F.col("domain") == "example-2.com").count() > 0
    assert kept.count() == parsed.count() - parsed.where(
        F.col("domain").isin(*BLOCKED_DOMAINS)
    ).count()


def test_domain_quality_rollup_hand_checked(spark):
    from cloud_ocr_summarizer_spark.operators.urls import domain_quality_rollup

    docs = spark.createDataFrame(
        [
            (10, "s", "en", "five plain words right here"),
            (20, "s", "en", "five plain words right here"),  # same domain
            (2, "s", "en", "blocked doc"),                   # example-2.com
        ],
        "doc_id long, source string, lang string, text string",
    )
    rows = {r.domain: r for r in domain_quality_rollup(docs).collect()}
    assert "example-2.com" not in rows  # gate fired
    r = rows["example-0.com"]
    assert (r.n_docs, r.total_tokens) == (2, 10)
    # quality identical for identical texts -> sum is 2x one doc's bp
    assert r.sum_quality_bp % 2 == 0 and r.sum_quality_bp > 0


def test_canonicalize_url_strips_every_noise_class(spark):
    from cloud_ocr_summarizer_spark.operators.urls import canonicalize_url_col

    cases = [
        # (messy, canonical)
        ("http://EXAMPLE-3.COM/p/7.html", "http://example-3.com/p/7.html"),
        ("http://example-1.com:80/p/5.html", "http://example-1.com/p/5.html"),
        ("http://h.com/p/1.html?utm_source=a&utm_b=c", "http://h.com/p/1.html"),
        ("http://h.com/p/1.html?keep=1&utm_x=2", "http://h.com/p/1.html?keep=1"),
        ("http://h.com/p/1.html#frag", "http://h.com/p/1.html"),
        ("http://h.com/p/1.html/", "http://h.com/p/1.html"),
        # everything at once
        (
            "http://EXAMPLE-0.COM:80/p/0.html/?utm_source=s0#sec0",
            "http://example-0.com/p/0.html",
        ),
        # non-default port and real params survive
        ("http://h.com:8080/a?x=1&y=2", "http://h.com:8080/a?x=1&y=2"),
        ("http://h.com/", "http://h.com/"),  # root slash kept
        # default ports strip before a query or end-of-string too,
        # and https strips its own default :443 (but not :80)
        ("http://h.com:80?q=1", "http://h.com?q=1"),
        ("http://h.com:80", "http://h.com"),
        ("https://h.com:443/x", "https://h.com/x"),
        ("https://h.com:443?q=1", "https://h.com?q=1"),
        ("https://h.com:80/x", "https://h.com:80/x"),
        ("http://h.com:443/x", "http://h.com:443/x"),
    ]
    df = spark.createDataFrame([(m,) for m, _ in cases], "url string")
    got = [r.c for r in df.select(canonicalize_url_col("url").alias("c")).collect()]
    assert got == [c for _, c in cases]


def test_url_dedup_collapses_pairs(spark):
    from cloud_ocr_summarizer_spark.operators.urls import (
        derive_messy_urls_from_documents,
        url_dedup,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(20)], "doc_id long"
    )
    out = {r.canonical_url: r for r in url_dedup(
        derive_messy_urls_from_documents(docs)
    ).collect()}
    assert len(out) == 10  # 20 docs -> 10 shared targets
    for m in range(10):
        r = out[f"http://example-{m % 10}.com/p/{m}.html"]
        assert (r.keeper_doc_id, r.n_variants) == (2 * m, 2)


def test_registered_domain_single_label_hosts(spark):
    """A single-label host (localhost, intranet names) is its own
    registered domain — without the fallback every such host collapses
    into one '' rollup group."""
    from cloud_ocr_summarizer_spark.operators.urls import registered_domain_col

    df = spark.createDataFrame(
        [("localhost",), ("intranet",), ("",)], "host string"
    )
    got = [
        r.d
        for r in df.select(
            registered_domain_col(F.col("host")).alias("d")
        ).collect()
    ]
    assert got == ["localhost", "intranet", ""]


def test_registered_domain_fuzz_vs_python(spark):
    """Seeded-random host shapes vs a pure-Python model of the
    documented semantics (last two labels; three under a multi-label
    public suffix, case-insensitively; single label = itself)."""
    import random

    from cloud_ocr_summarizer_spark.operators.urls import (
        PSL_MULTI_SUFFIXES,
        registered_domain_col,
    )

    rng = random.Random(99)
    labels = ["a", "B", "shop", "www", "x-1", "co", "uk", "com", "au",
              "gob", "mx", "example"]
    hosts = []
    for _ in range(300):
        n = rng.randrange(1, 6)
        hosts.append(".".join(rng.choice(labels) for _ in range(n)))

    def model(h):
        parts = h.split(".")
        if len(parts) < 2:
            return h
        last2 = ".".join(parts[-2:])
        if last2.lower() in PSL_MULTI_SUFFIXES and len(parts) >= 3:
            return ".".join(parts[-3:])
        return last2

    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = [
        r.d
        for r in df.select(
            "host", registered_domain_col(F.col("host")).alias("d")
        ).collect()
    ]
    assert got == [model(h) for h in hosts]
