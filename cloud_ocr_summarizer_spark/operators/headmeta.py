"""HTML <head> metadata: title / description / og:title / canonical.

The document head carries the machine-readable identity of a page —
``<title>``, ``<meta name="description">``, OpenGraph properties, the
``<link rel="canonical">`` pointer, and the charset declaration.  A
training-data pipeline reads these before the body: canonical pointers
drive URL-level dedup (the server TELLING you two pages are the same
document), and titles/descriptions feed quality and dedup features.

Reference tie-in: the reference extracts body blocks only
(vision_processor.py:241-288); head metadata is part of the
boilerplate-aware extraction surface the north rule adds (same tier as
operators/dom.py's Readability rules, which this complements).

Scale design:
  - Extraction is strictly row-local: scope to the ``<head>`` substring
    FIRST (a whole-document scan would swallow decoy tags in the
    body), strip comments, then bounded per-field regexp extracts.
    Zero shuffles, zero Python.
  - Canonical clustering is one groupBy on the effective URL — the
    same single-shuffle shape as exact dedup (``dedup.py``), because
    that is what it is: server-declared duplicate clustering.  Hot
    canonical targets aggregate counts/mins only (bounded state).

Synthesis (datagen convention — every field re-derivable from doc_id
arithmetic; the DuckDB twin never parses HTML):
  - title 'Page d', with an '&' (entity-escaped in the HTML) when
    d % 5 == 0; a DECOY title lives in a head comment AND another in
    the body, so an unscoped or comment-blind parser captures the
    wrong one.
  - description 'Desc d' unless d % 4 == 1 (absent); attribute order
    flips on d % 2 and quoting style switches to single quotes on
    d % 7 == 0 — both real-world forms.
  - og:title 'OG d' unless d % 3 == 2 (absent).
  - canonical link unless d % 3 == 1 (absent): points at the
    PREDECESSOR doc's URL when d % 6 == 2 (a server-declared dup),
    else self; the href is XML-escaped (&amp; in ?ref= queries).
  - charset 'utf-8' when d % 2 == 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column

from cloud_ocr_summarizer_spark.operators.sitemap import xml_escape, xml_unescape


def derive_head_html_from_documents(
    docs: DataFrame, parsed_urls: DataFrame | None = None
) -> DataFrame:
    """documents -> (doc_id, url, html) pages with adversarial heads.

    The predecessor-URL canonical targets need url(doc_id - 1), which
    depends on the predecessor row's (source, lang) — a 1:1 self-join
    on doc_id - 1 (synthesis-only; the parse side stays map-only).
    """
    if parsed_urls is None:
        from cloud_ocr_summarizer_spark.operators.urls import (
            derive_urls_from_documents,
            parse_urls,
        )

        parsed_urls = parse_urls(derive_urls_from_documents(docs))
    u = parsed_urls.select("doc_id", "url")
    prev = u.select((F.col("doc_id") + 1).alias("doc_id"), F.col("url").alias("_prev"))
    d = F.col("doc_id")
    title_raw = F.concat(
        F.lit("Page "),
        F.when(d % 5 == 0, F.lit("& ")).otherwise(F.lit("")),
        d.cast("string"),
    )
    desc_val = F.concat(F.lit("Desc "), d.cast("string"))
    desc_tag = (
        F.when(d % 4 == 1, F.lit(""))
        .when(
            d % 7 == 0,
            F.concat(F.lit("<meta name='description' content='"), desc_val, F.lit("'>\n")),
        )
        .when(
            d % 2 == 0,
            F.concat(F.lit('<meta name="description" content="'), desc_val, F.lit('">\n')),
        )
        .otherwise(
            F.concat(F.lit('<meta content="'), desc_val, F.lit('" name="description">\n'))
        )
    )
    og_tag = F.when(d % 3 == 2, F.lit("")).otherwise(
        F.concat(
            F.lit('<meta property="og:title" content="OG '),
            d.cast("string"),
            F.lit('"/>\n'),
        )
    )
    canon_target = F.when(d % 6 == 2, F.coalesce(F.col("_prev"), F.col("url"))).otherwise(
        F.col("url")
    )
    canon_tag = F.when(d % 3 == 1, F.lit("")).otherwise(
        F.concat(
            F.lit('<link rel="canonical" href="'),
            xml_escape(canon_target),
            F.lit('">\n'),
        )
    )
    charset_tag = F.when(d % 2 == 0, F.lit('<meta charset="utf-8">\n')).otherwise(
        F.lit("")
    )
    html = F.concat(
        F.lit(
            "<html><head>\n"
            "<!-- decoy a comment-blind parser captures:"
            " <title>Decoy comment title</title> -->\n"
        ),
        charset_tag,
        F.lit("<title>"),
        xml_escape(title_raw),
        F.lit("</title>\n"),
        desc_tag,
        og_tag,
        canon_tag,
        F.lit("</head><body><p>Body "),
        d.cast("string"),
        F.lit("</p><title>Decoy body title</title></body></html>"),
    )
    return (
        u.join(prev, "doc_id", "left")
        .select("doc_id", "url", html.alias("html"))
    )


def _attr_tag_value(head: Column, key_attr: str, key_val: str) -> Column:
    """content= of the meta tag carrying key_attr="key_val" (either
    attribute order, double or single quotes), NULL when absent."""
    tag = F.regexp_extract(
        head,
        rf'(?i)<meta[^>]*{key_attr}=["\']{key_val}["\'][^>]*>',
        0,
    )
    return F.nullif(
        F.regexp_extract(tag, r'''content=["']([^"']*)["']''', 1), F.lit("")
    )


def extract_head_meta(
    html_df: DataFrame, *, html_col: str = "html", keep: tuple[str, ...] = ("url",)
) -> DataFrame:
    """(doc_id, html) -> head metadata columns, head-scoped + comment-safe.

    Row-local: the ``<head>`` substring is isolated first, comments are
    stripped second, and only then do the per-field extracts run —
    decoy titles in comments or in the body never match.  Optional
    fields come back NULL, never ''.
    """
    head = F.regexp_replace(
        F.regexp_extract(F.col(html_col), r"(?s)<head>(.*?)</head>", 1),
        r"(?s)<!--.*?-->",
        "",
    )
    title = F.nullif(
        xml_unescape(F.regexp_extract(head, r"(?s)<title>(.*?)</title>", 1)),
        F.lit(""),
    )
    canon_tag = F.regexp_extract(
        head, r'''(?i)<link[^>]*rel=["']canonical["'][^>]*>''', 0
    )
    canonical = F.nullif(
        xml_unescape(
            F.regexp_extract(canon_tag, r'''href=["']([^"']*)["']''', 1)
        ),
        F.lit(""),
    )
    charset = F.nullif(
        F.regexp_extract(head, r'''(?i)<meta charset=["']([^"']+)["']''', 1),
        F.lit(""),
    )
    return html_df.select(
        "doc_id",
        *[F.col(c) for c in keep if c in html_df.columns],
        title.alias("title"),
        _attr_tag_value(head, "name", "description").alias("description"),
        _attr_tag_value(head, "property", "og:title").alias("og_title"),
        canonical.alias("canonical_url"),
        charset.alias("charset"),
    )


def canonical_clusters(meta: DataFrame) -> DataFrame:
    """Server-declared duplicate clusters: group on the effective URL.

    effective = canonical_url when declared, else the fetched url —
    one groupBy shuffle (the exact-dedup shape); per-cluster state is
    a count, a min, and a self-pointer count (bounded)."""
    eff = F.coalesce(F.col("canonical_url"), F.col("url"))
    return meta.groupBy(eff.alias("cluster_url")).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("rep_doc_id"),
        F.sum(
            F.when(
                F.col("canonical_url").isNull()
                | (F.col("canonical_url") == F.col("url")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_self"),
    )
