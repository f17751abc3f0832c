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


def derive_urls_from_documents(
    docs: DataFrame, keep: tuple[str, ...] = ()
) -> DataFrame:
    """documents -> (doc_id, url) exercising every parser branch.

    scheme https iff doc_id%4==0; host = source-lang.example-(id%10).tld
    with the tld a function of lang; port 8080 iff doc_id%5==0; path
    /lang/doc-id.html; query ref=(id%7) iff doc_id%3==0.  ``keep``
    carries extra document columns through (projection, no join — the
    datagen convention), so URL-keyed rollups over document content
    never pay a doc_id re-join shuffle.
    """
    d = F.col("doc_id")
    lang = F.coalesce(F.col("lang"), F.lit("xx"))
    tld = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in _TLD_BY_LANG.items() for x in kv]
            ),
            lang,
        ),
        F.lit("org"),
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
    from cloud_ocr_summarizer_spark.functions.text import whitespace_tokens_col
    from cloud_ocr_summarizer_spark.operators.textstats import quality_score_col

    parsed = parse_urls(derive_urls_from_documents(docs, keep=("text",)))
    kept = domain_gate(parsed)
    return kept.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(whitespace_tokens_col(F.col("text"))))
        .cast("bigint")
        .alias("total_tokens"),
        F.sum(quality_score_col(F.col("text"))).cast("bigint").alias(
            "sum_quality_bp"
        ),
    )


def _extract(url: Column, pattern: str) -> Column:
    return F.nullif(F.regexp_extract(url, pattern, 1), F.lit(""))


def parse_urls(df: DataFrame, *, url_col: str = "url") -> DataFrame:
    """Append scheme/host/port/path/query_string/domain to ``df``.

    ``domain`` is the registered domain approximated as the last two
    host labels — the public-suffix-list refinement is a broadcast
    lookup swap, not a plan change.  All regexp, row-local.
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
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"),
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
