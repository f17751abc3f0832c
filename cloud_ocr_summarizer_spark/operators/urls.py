"""URL parsing and domain-level gating for web-corpus curation.

Crawl curation operates on URLs before it ever reads a byte of body
text: parse scheme/host/port/path/query, reduce the host to its
registered domain, and drop documents from blocklisted domains
(C4/RefinedWeb both gate on domain blocklists; domain is also the
grouping key for per-site caps — see operators/sampling.cap_per_source
for the cap half).

Everything here is row-local JVM regexp work (whole-stage codegen, zero
Python, zero shuffle except the gate's broadcast anti-join), so the
plans are trivially 100-TB-safe.

The synthetic side (``derive_urls_from_documents``) builds a
deterministic URL per document covering every parser branch — scheme
choice, optional port, optional query string, multi-label hosts with a
doc-varying registered domain.  The DuckDB twin re-derives every parsed
field straight from (doc_id, source, lang) arithmetic, never from the
URL string, so the value check proves the parser inverts the synthesis
exactly (the dom.py round-trip policy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BLOCKED_DOMAINS = ("example-2.com", "example-5.de", "example-8.cn")

_TLD_BY_LANG = {"en": "com", "de": "de", "es": "es", "fr": "fr", "zh": "cn"}

# Trimmed public-suffix-list slice: the high-traffic MULTI-LABEL public
# suffixes (publicsuffix.org is public data; the full list is a config
# swap — bigger tuple, same plan).  When a host's last two labels form
# a public suffix, the registered domain is THREE labels (foo.co.uk),
# not two (co.uk) — the last-two-labels heuristic is wrong for every
# host under these.
PSL_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "co.za", "net.za", "org.za", "web.za",
    "com.br", "net.br", "org.br", "gov.br",
    "com.mx", "org.mx", "net.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "org.tw", "net.tw",
    "com.hk", "org.hk", "net.hk", "edu.hk",
    "com.sg", "org.sg", "net.sg", "edu.sg",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr",
    "com.tr", "org.tr", "net.tr", "gen.tr",
    "co.il", "org.il", "net.il", "ac.il",
    "com.my", "org.my", "net.my",
    "co.id", "or.id", "web.id", "ac.id",
    "com.ph", "org.ph", "net.ph",
    "com.vn", "org.vn", "net.vn",
    "co.th", "or.th", "in.th", "ac.th",
    "com.eg", "org.eg", "net.eg",
    "com.ng", "org.ng", "net.ng",
    "com.pk", "org.pk", "net.pk",
    "com.sa", "org.sa", "net.sa",
    "com.ua", "org.ua", "net.ua", "in.ua",
    "com.pl", "net.pl", "org.pl",
    "com.co", "net.co", "org.co",
    "com.pe", "org.pe", "net.pe",
    "com.ec", "org.ec", "net.ec",
    "com.uy", "org.uy", "net.uy",
)


def registered_domain_col(host: Column) -> Column:
    """Registered domain of ``host``: one label plus its public suffix.

    Last two labels, UNLESS those two labels are themselves a public
    suffix (the :data:`PSL_MULTI_SUFFIXES` slice — ``co.uk``/``com.au``
    class), in which case the registered domain is the last three.  A
    host that IS a bare public suffix (``co.uk`` exactly) degenerates
    to itself.  Row-local: two anchored regexps + an In-literal over
    the suffix tuple (whole-stage codegen; a full-PSL deployment swaps
    the tuple for a broadcast lookup — same semantics, bigger table).
    The suffix comparison is case-insensitive (DNS names are; crawl
    noise like ``FOO.CO.UK`` must not degrade to the bare suffix) while
    the returned labels keep the host's original casing.  A single-label
    host (``localhost``, intranet names) IS its own registered domain —
    without the fallback the two-label regexp returns '' and a
    domain-keyed rollup would merge every such host into one empty
    group.
    """
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    return (
        F.when(
            F.lower(last2).isin(*PSL_MULTI_SUFFIXES) & (last3 != F.lit("")),
            last3,
        )
        .when(last2 == F.lit(""), host)
        .otherwise(last2)
    )


def derive_urls_from_documents(
    docs: DataFrame, keep: tuple[str, ...] = ()
) -> DataFrame:
    """documents -> (doc_id, url) exercising every parser branch.

    scheme https iff doc_id%4==0; host = source-lang.example-(id%10).tld
    with the tld a function of lang EXCEPT doc_id%11==3 -> co.uk and
    doc_id%11==7 -> com.au (multi-label public suffixes, so a last-two-
    labels registered-domain heuristic fails the round trip); port 8080
    iff doc_id%5==0; path /lang/doc-id.html; query ref=(id%7) iff
    doc_id%3==0.  ``keep`` carries extra document columns through
    (projection, no join — the datagen convention), so URL-keyed
    rollups over document content never pay a doc_id re-join shuffle.
    """
    d = F.col("doc_id")
    lang = F.coalesce(F.col("lang"), F.lit("xx"))
    lang_tld = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in _TLD_BY_LANG.items() for x in kv]
            ),
            lang,
        ),
        F.lit("org"),
    )
    tld = (
        F.when(d % 11 == 3, F.lit("co.uk"))
        .when(d % 11 == 7, F.lit("com.au"))
        .otherwise(lang_tld)
    )
    host = F.concat(
        F.coalesce(F.col("source"), F.lit("unknown")),
        F.lit("-"),
        lang,
        F.lit(".example-"),
        (d % 10).cast("string"),
        F.lit("."),
        tld,
    )
    url = F.concat(
        F.when(d % 4 == 0, F.lit("https")).otherwise(F.lit("http")),
        F.lit("://"),
        host,
        F.when(d % 5 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/"),
        lang,
        F.lit("/doc-"),
        d.cast("string"),
        F.lit(".html"),
        F.when(
            d % 3 == 0, F.concat(F.lit("?ref="), (d % 7).cast("string"))
        ).otherwise(F.lit("")),
    )
    return docs.select(
        d.alias("doc_id"), url.alias("url"), *[F.col(c) for c in keep]
    )


def domain_quality_rollup(docs: DataFrame) -> DataFrame:
    """Per registered domain: doc count, total tokens, summed quality.

    The composed URL-keyed curation rollup — synthesize/parse the URL,
    drop blocklisted domains, score each doc (integer-bp quality,
    textstats.quality_score_col), aggregate by domain.  ``keep``
    carries text through the derive/parse projections, so the only
    shuffle is the final domain aggregate (plus the broadcast anti-join
    gate); sums stay integer so the cross-engine hash is exact (the
    consumer divides sum_quality_bp / n_docs itself).
    """
    from cloud_ocr_summarizer_spark.functions.text import (
        let_col,
        whitespace_tokens_col,
    )
    from cloud_ocr_summarizer_spark.operators.textstats import (
        quality_score_from_words,
    )

    parsed = parse_urls(derive_urls_from_documents(docs, keep=("text",)))
    kept = domain_gate(parsed)
    # tokenize once per doc: both aggregated measures read the let-bound
    # token array (quality_score_col alone would re-split the text)
    per_doc = let_col(
        whitespace_tokens_col(F.col("text")),
        lambda ws: F.struct(
            F.size(ws).cast("bigint").alias("nt"),
            quality_score_from_words(ws, F.col("text")).alias("q"),
        ),
    )
    return (
        kept.select("domain", per_doc.alias("_m"))
        .groupBy("domain")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_m.nt").cast("bigint").alias("total_tokens"),
            F.sum("_m.q").cast("bigint").alias("sum_quality_bp"),
        )
    )


def _extract(url: Column, pattern: str) -> Column:
    return F.nullif(F.regexp_extract(url, pattern, 1), F.lit(""))


def parse_urls(df: DataFrame, *, url_col: str = "url") -> DataFrame:
    """Append scheme/host/port/path/query_string/domain to ``df``.

    ``domain`` is the registered domain per
    :func:`registered_domain_col` — public-suffix-aware, so hosts under
    ``co.uk``-class suffixes resolve to three labels.  All regexp,
    row-local.
    """
    u = F.col(url_col)
    host = _extract(u, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)")
    return df.select(
        "*",
        _extract(u, r"^([a-z][a-z0-9+.-]*)://").alias("scheme"),
        host.alias("host"),
        _extract(u, r"^[a-z][a-z0-9+.-]*://[^/:?#]+:(\d+)")
        .cast("int")
        .alias("port"),
        _extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)").alias("path"),
        _extract(u, r"\?([^#]*)").alias("query_string"),
        registered_domain_col(host).alias("domain"),
    )


def domain_gate(
    parsed: DataFrame,
    spark=None,
    *,
    blocked: tuple[str, ...] = BLOCKED_DOMAINS,
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted.

    Broadcast anti-join against the (tiny) blocklist table — NOT an
    ``isin`` literal, so a million-domain production blocklist is the
    same plan with a bigger broadcast (and past broadcast size, a
    bucketed join — still never a corpus reshuffle).
    """
    sess = spark or parsed.sparkSession
    block_df = sess.createDataFrame(
        [(b,) for b in blocked], schema="domain string"
    )
    return parsed.join(F.broadcast(block_df), "domain", "left_anti")


def derive_messy_urls_from_documents(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, url): noisy VARIANTS of shared targets.

    Docs ``2m`` and ``2m+1`` both point at canonical target
    ``http://example-(m%10).com/p/m.html`` but each may carry
    deterministic crawl noise — uppercase host (id%2==1), a default
    :80 port (id%5==0), utm_* tracking params (id%3==0), a fragment
    (id%4==0), a trailing slash (id%7==0) — so a correct canonicalizer
    collapses every pair and a lazy string-equality dedup does not.
    """
    d = F.col("doc_id")
    m = F.expr("doc_id div 2")
    host = F.concat(
        F.lit("example-"), (m % 10).cast("string"), F.lit(".com")
    )
    url = F.concat(
        F.lit("http://"),
        F.when(d % 2 == 1, F.upper(host)).otherwise(host),
        F.when(d % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p/"),
        m.cast("string"),
        F.lit(".html"),
        F.when(d % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            d % 3 == 0,
            F.concat(F.lit("?utm_source=s"), (d % 5).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            d % 4 == 0, F.concat(F.lit("#sec"), (d % 4).cast("string"))
        ).otherwise(F.lit("")),
    )
    return docs.select(d.alias("doc_id"), url.alias("url"))


def canonicalize_url_col(url: Column) -> Column:
    """Canonical URL: the crawl-frontier/dedup normal form.

    Drops the fragment, lowercases scheme+host, drops the scheme's
    default port (:80 for http, :443 for https — whether followed by a
    path, a query, or nothing), strips utm_* tracking params (tidying
    left-over separators), and trims a trailing slash from a non-root
    path.  Pure regexp chain — row-local, whole-stage codegen.
    """
    u = F.regexp_replace(F.coalesce(url, F.lit("")), r"#.*$", "")
    # lowercase only the scheme://host[:port] authority, never the
    # path or query (the prefix stops at the first /, ? or #)
    prefix = F.regexp_extract(u, r"^([a-z]+://[^/?#]*)", 1)
    rest = F.substring(u, F.length(prefix) + 1, 1_000_000)
    u = F.concat(F.lower(prefix), rest)
    # default ports strip before a path, a query, or end-of-string
    # (fragments are already gone)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?]|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?]|$)", r"$1$2")
    # strip utm params wherever they sit in the query string
    u = F.regexp_replace(u, r"([?&])utm_[^&#]*", r"$1")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    # trailing slash off a non-root path
    u = F.regexp_replace(u, r"(://[^/]+/.+?)/$", r"$1")
    return u


def url_dedup(docs_with_urls: DataFrame, *, url_col: str = "url") -> DataFrame:
    """Collapse URL variants: one row per canonical URL.

    Output (canonical_url, keeper_doc_id = min doc_id, n_variants) —
    one canonicalizing projection + one aggregate (map-side partial min
    collapses hot URLs before the exchange).
    """
    return (
        docs_with_urls.select(
            "doc_id", canonicalize_url_col(F.col(url_col)).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").cast("bigint").alias("n_variants"),
        )
    )
