"""Sitemap XML: sharded synthesis, URL-entry parsing, and index files.

Crawl planning discovers most of its frontier from sitemaps (the
sitemaps.org protocol: per-host ``<urlset>`` XML files of up to 50,000
``<url>`` entries, plus ``<sitemapindex>`` files pointing at the
shards).  ``robotstxt.parse_sitemaps`` already recovers the *pointers*
from robots.txt; this module ingests the sitemap documents themselves —
the missing half of frontier discovery.

Reference tie-in: the reference pipeline (vision_processor.py:146-326)
starts from already-fetched objects; sitemap ingestion is part of the
crawl/curation surface the north rule adds around it, same tier as the
WARC and robots.txt parsers.

Scale design:
  - The protocol itself bounds every file at 50,000 entries, so a
    parsed sitemap row is bounded by CONSTRUCTION — the per-file
    ``regexp_extract_all`` + ``posexplode`` is row-local work on a
    capped payload (the exact property the WARC parser relies on).
  - Synthesis shards per (host, shard) with the same cap, so its one
    ``collect_list`` buffer is bounded at ``max_urls`` structs — never
    host-corpus-sized (hot-host skew hits the SHARD key, which the cap
    splits).  The shard assignment is a per-host ``row_number`` window
    ordered by doc_id: deterministic and re-derivable in SQL.
  - Parsing is zero-shuffle (map-only over sitemap files); the only
    exchanges in the round-trip queries are the synthesis window +
    shard groupBy.

Synthesis (datagen convention — every field re-derivable from doc_id
arithmetic so the DuckDB twin never parses XML):
  - ``<loc>`` is the document's synthesized URL; docs with a query
    string (doc_id % 3 == 0) append a second parameter that must be
    XML-escaped in the file (``&amp;src=sm``) — a parser that skips
    entity unescaping fails the round trip.
  - ``<lastmod>`` only when doc_id % 2 == 0: 2026-MM-DD with
    MM = 1 + doc_id % 12, DD = 1 + doc_id % 28.
  - ``<priority>`` omitted when doc_id % 4 == 1, else 0.(doc_id % 10).
  - An XML comment containing a DECOY ``<url><loc>`` block sits at the
    top of every shard — a parser that does not strip comments first
    collects a phantom URL per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.column import Column

SITEMAP_MAX_URLS = 50_000  # sitemaps.org per-file cap

_XML_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    "<!-- generated shard; decoy entry a comment-blind parser trips on:"
    " <url><loc>http://decoy.invalid/</loc></url> -->\n"
)


def xml_escape(col: Column) -> Column:
    """Minimal XML text escaping (&, <, > — ampersand FIRST)."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def xml_unescape(col: Column) -> Column:
    """Inverse of :func:`xml_escape` (ampersand LAST)."""
    out = F.replace(col, F.lit("&lt;"), F.lit("<"))
    out = F.replace(out, F.lit("&gt;"), F.lit(">"))
    return F.replace(out, F.lit("&amp;"), F.lit("&"))


def derive_sitemap_xml_from_documents(
    docs: DataFrame,
    parsed_urls: DataFrame | None = None,
    *,
    max_urls: int = SITEMAP_MAX_URLS,
) -> DataFrame:
    """documents -> (host, shard_id, sitemap_xml) sharded urlset files.

    Entries within a shard are ordered by doc_id (the per-host window
    that assigns shards also fixes the order, and the shard groupBy
    re-sorts by the window rank — order survives any partitioning).
    The ``collect_list`` buffer is bounded at ``max_urls`` by the shard
    key itself.
    """
    if parsed_urls is None:
        from cloud_ocr_summarizer_spark.operators.urls import (
            derive_urls_from_documents,
            parse_urls,
        )

        parsed_urls = parse_urls(derive_urls_from_documents(docs))
    d = F.col("doc_id")
    loc_xml = F.concat(
        xml_escape(F.col("url")),
        F.when(d % 3 == 0, F.lit("&amp;src=sm")).otherwise(F.lit("")),
    )
    lastmod = F.concat(
        F.lit("2026-"),
        F.lpad((d % 12 + 1).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((d % 28 + 1).cast("string"), 2, "0"),
    )
    entry = F.concat(
        F.lit("  <url>\n    <loc>"),
        loc_xml,
        F.lit("</loc>\n"),
        F.when(
            d % 2 == 0,
            F.concat(F.lit("    <lastmod>"), lastmod, F.lit("</lastmod>\n")),
        ).otherwise(F.lit("")),
        F.when(d % 4 == 1, F.lit("")).otherwise(
            F.concat(
                F.lit("    <priority>0."),
                (d % 10).cast("string"),
                F.lit("</priority>\n"),
            )
        ),
        F.lit("  </url>"),
    )
    w = Window.partitionBy("host").orderBy("doc_id")
    ranked = parsed_urls.select(
        "host", "doc_id", entry.alias("_entry")
    ).withColumn("_rn", F.row_number().over(w) - 1)
    return (
        ranked.groupBy(
            "host", F.expr(f"_rn div {int(max_urls)}").alias("shard_id")
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_rn", "_entry"))),
                    lambda s: s["_entry"],
                ),
                "\n",
            ).alias("_body")
        )
        .select(
            "host",
            F.col("shard_id").cast("int").alias("shard_id"),
            F.concat(
                F.lit(_XML_HEADER), F.col("_body"), F.lit("\n</urlset>\n")
            ).alias("sitemap_xml"),
        )
    )


def parse_sitemap_urls(
    sitemaps: DataFrame, *, xml_col: str = "sitemap_xml"
) -> DataFrame:
    """(… , sitemap_xml) -> one row per <url> entry, document order.

    Comments are stripped FIRST (the decoy trap), then ``<url>`` blocks
    are extracted with a DOTALL non-greedy scan and exploded with their
    position; loc/lastmod/priority come out of each block, loc entity-
    unescaped, priority scaled to an exact integer milli value
    (DECIMAL parse — float would not hash byte-stable).  Row-local,
    zero shuffle; per-row work bounded by the protocol's 50k-entry cap.
    Output: passthrough columns + (pos, loc, lastmod, priority_milli).
    """
    blocks = F.expr(
        f"regexp_extract_all(regexp_replace({xml_col}, '(?s)<!--.*?-->', ''),"
        " '(?s)<url>(.*?)</url>', 1)"
    )
    passthrough = [c for c in sitemaps.columns if c != xml_col]
    b = F.col("_block")
    priority = F.nullif(
        F.regexp_extract(b, r"<priority>\s*([0-9.]+)\s*</priority>", 1),
        F.lit(""),
    )
    return sitemaps.select(
        *passthrough, F.posexplode(blocks).alias("_i", "_block")
    ).select(
        *passthrough,
        (F.col("_i") + 1).cast("int").alias("pos"),
        xml_unescape(
            F.regexp_extract(b, r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
        ).alias("loc"),
        F.nullif(
            F.regexp_extract(b, r"<lastmod>\s*([0-9-]+)\s*</lastmod>", 1),
            F.lit(""),
        ).alias("lastmod"),
        (priority.try_cast("decimal(5,3)") * 1000).cast("int").alias(
            "priority_milli"
        ),
    )


def derive_sitemap_index(shards: DataFrame) -> DataFrame:
    """(host, shard_id, …) -> (host, index_xml) sitemapindex files.

    One ``<sitemap><loc>https://host/sitemap-K.xml</loc></sitemap>``
    per shard, K ascending — the collect side is bounded by the number
    of shards per host (corpus/50k), not by URL count."""
    return (
        shards.groupBy("host")
        .agg(F.max("shard_id").cast("int").alias("_mx"))
        .select(
            "host",
            F.concat(
                F.lit(
                    '<?xml version="1.0" encoding="UTF-8"?>\n<sitemapindex '
                    'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                ),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(0), F.col("_mx")),
                        lambda k: F.concat(
                            F.lit("  <sitemap><loc>https://"),
                            F.col("host"),
                            F.lit("/sitemap-"),
                            k.cast("string"),
                            F.lit(".xml</loc></sitemap>"),
                        ),
                    ),
                    "\n",
                ),
                F.lit("\n</sitemapindex>\n"),
            ).alias("index_xml"),
        )
    )


def parse_sitemap_index(
    index: DataFrame, *, xml_col: str = "index_xml"
) -> DataFrame:
    """(host, index_xml) -> (host, shard_id, shard_loc) per pointer."""
    locs = F.expr(
        f"regexp_extract_all({xml_col},"
        " '(?s)<sitemap>\\\\s*<loc>\\\\s*(.*?)\\\\s*</loc>', 1)"
    )
    passthrough = [c for c in index.columns if c != xml_col]
    return index.select(
        *passthrough, F.posexplode(locs).alias("_i", "_loc")
    ).select(
        *passthrough,
        F.col("_i").cast("int").alias("shard_id"),
        xml_unescape(F.col("_loc")).alias("shard_loc"),
    )


def derive_crawl_state_from_documents(docs: DataFrame) -> DataFrame:
    """documents -> (url, last_crawl) — the synthetic fetch ledger.

    ``last_crawl`` is an ISO date derived from doc_id arithmetic
    (month 1 + (5·d) % 12, day 1 + (11·d) % 28), chosen coprime to the
    sitemap lastmod formula so the staleness comparison exercises both
    outcomes densely.  ISO dates compare correctly as strings — no date
    type crosses the engine boundary.
    """
    from cloud_ocr_summarizer_spark.operators.urls import (
        derive_urls_from_documents,
    )

    d = F.col("doc_id")
    last_crawl = F.concat(
        F.lit("2026-"),
        F.lpad(((d * 5) % 12 + 1).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(((d * 11) % 28 + 1).cast("string"), 2, "0"),
    )
    return derive_urls_from_documents(docs).select(
        "url", last_crawl.alias("last_crawl")
    )


def recrawl_schedule(
    entries: DataFrame, crawl_state: DataFrame
) -> DataFrame:
    """Sitemap-driven recrawl planning -> (host, n_urls, n_stale).

    A URL needs refetching when its sitemap ``<lastmod>`` is missing
    (unknown = must fetch) or later than the ledger's ``last_crawl``
    (ISO strings compare lexicographically).  Entries and ledger are
    keyed on (host, path) — the crawl-state normal form; the sitemap
    ``loc`` may carry tracking params the ledger URL does not, so the
    raw strings would NOT join.  One (host, path) equi-join + one host
    aggregate are the only corpus-sized exchanges; an entry with no
    ledger row counts stale (never fetched).
    """
    from cloud_ocr_summarizer_spark.operators.urls import parse_urls

    e = parse_urls(
        entries.select("loc", "lastmod"), url_col="loc"
    ).select("host", "path", "lastmod")
    s = parse_urls(crawl_state, url_col="url").select(
        F.col("host").alias("s_host"),
        F.col("path").alias("s_path"),
        "last_crawl",
    )
    joined = e.join(
        s,
        (e.host == s.s_host) & (e.path == s.s_path),
        "left",
    )
    stale = (
        F.col("lastmod").isNull()
        | F.col("last_crawl").isNull()
        | (F.col("lastmod") > F.col("last_crawl"))
    )
    return joined.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urls"),
        F.sum(F.when(stale, 1).otherwise(0)).cast("bigint").alias("n_stale"),
    )


def derive_corrupted_sitemap_shards(
    docs: DataFrame, *, max_urls: int = SITEMAP_MAX_URLS
) -> DataFrame:
    """Sitemap shards with a deterministic corruption class: shards
    where ``(length(host) + shard_id) % 3 == 0`` lose the LAST entry's
    closing ``</url>`` tag (a truncated-upload shape), so that block no
    longer parses.  The predicate is a pure function of (host,
    shard_id) — re-derivable in SQL without touching XML."""
    shards = derive_sitemap_xml_from_documents(docs, max_urls=max_urls)
    corrupt = (F.length("host") + F.col("shard_id")) % 3 == 0
    # drop the final closing tag before </urlset> (DOTALL-anchored)
    broken = F.regexp_replace(
        F.col("sitemap_xml"), r"(?s)</url>(\s*</urlset>\s*)$", r"$1"
    )
    return shards.select(
        "host",
        "shard_id",
        F.when(corrupt, broken).otherwise(F.col("sitemap_xml")).alias(
            "sitemap_xml"
        ),
    )


def sitemap_parse_audit(
    sitemaps: DataFrame, *, xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Per-shard parse observability -> (…, n_locs, n_parsed, n_dropped).

    ``n_locs`` counts ``<loc>`` tags after comment stripping (every
    well-formed entry carries exactly one); ``n_parsed`` counts blocks
    the entry regex actually recovers.  A malformed tail therefore
    surfaces as ``n_dropped > 0`` instead of vanishing — the same
    policy as ``warc.warc_malformed_audit``.  Row-local, zero shuffle.
    """
    clean = F.regexp_replace(F.col(xml_col), r"(?s)<!--.*?-->", "")
    n_locs = F.size(F.regexp_extract_all(clean, F.lit("<loc>"), 0))
    n_parsed = F.size(
        F.regexp_extract_all(clean, F.lit(r"(?s)<url>(.*?)</url>"), 1)
    )
    passthrough = [c for c in sitemaps.columns if c != xml_col]
    return sitemaps.select(
        *passthrough,
        n_locs.cast("int").alias("n_locs"),
        n_parsed.cast("int").alias("n_parsed"),
        (n_locs - n_parsed).cast("int").alias("n_dropped"),
    )
