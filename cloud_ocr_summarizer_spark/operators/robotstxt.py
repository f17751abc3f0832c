"""robots.txt rules: synthesis, parsing, and the longest-match crawl gate.

The crawl-compliance surface so far gated on the per-PAGE signal
(``dom.meta_robots_gate``, the <meta name="robots" content="noindex">
tag).  This module adds the per-HOST side a real crawler enforces
BEFORE fetching: the robots.txt file — ``User-agent`` groups of
``Allow:`` / ``Disallow:`` path-prefix rules, resolved per URL by the
longest-matching rule with Allow winning length ties (the Google/REP
resolution order, RFC 9309 §2.2.2).

Reference tie-in: the reference pipeline (vision_processor.py:146-326)
assumes its inputs were already compliantly crawled; this module is
part of the crawl/curation surface the north rule adds around it.

Scale design:
  - robots.txt files are per-host and small BY CONSTRUCTION (one file
    per host; real crawlers cap reads at 500 KiB, RFC 9309 §2.5) — the
    parsed rule set per host is a bounded array, so attaching it to the
    corpus is one equi-join on host followed by a ROW-LOCAL
    higher-order-function longest-match: zero extra shuffles, no
    per-key aggregation state on the corpus side.
  - The rules table is host-count-sized.  Small corpora broadcast it;
    at web scale (10^8 hosts) the equi-join shuffles the rules side
    only — the corpus side is already being scanned — and AQE picks
    the strategy.  Nothing here is corpus × rules.

Synthesis (datagen convention: every field derivable by arithmetic so
the DuckDB twin re-derives rules + resolution independently):
  host digit g = doc_id % 10 (embedded in the host string), lang from
  the host label:
    g % 5 == 1  ->  a decoy ``User-agent: badbot / Disallow: /`` group
                    FIRST (a correct parser must scope to ``*``)
    g == 9      ->  ``Disallow: /``          (host fully blocked)
    g % 3 == 0  ->  ``Disallow: /{lang}/``   (language dir blocked)
    g % 2 == 0  ->  ``Allow: /{lang}/doc-``  (longer Allow overrides
                    the dir Disallow for doc pages — the longest-match
                    override case)
    always      ->  ``Disallow: /tmp/``      (never matches a doc path)
  plus a ``#`` comment line a parser must ignore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column


def _host_g(host: Column) -> Column:
    return F.regexp_extract(host, r"\.example-(\d)\.", 1).try_cast("int")


def _host_lang(host: Column) -> Column:
    return F.regexp_extract(host, r"-([a-z]{2})\.example-", 1)


def derive_robots_txt_from_documents(
    docs: DataFrame, parsed_urls: DataFrame | None = None
) -> DataFrame:
    """documents -> one (host, robots_txt) row per distinct URL host.

    Rules are a function of the HOST STRING alone (digit + lang are
    regexp-extracted back out of it), so the twin can re-derive them
    without re-running the URL synthesis join.  Pass ``parsed_urls``
    (any frame carrying ``host``) when the caller already parsed the
    corpus URLs — otherwise this re-derives and re-parses them, and a
    composed gate job would pay the corpus-wide projection + regexp
    pass twice."""
    if parsed_urls is None:
        from cloud_ocr_summarizer_spark.operators.urls import (
            derive_urls_from_documents,
            parse_urls,
        )

        parsed_urls = parse_urls(derive_urls_from_documents(docs))
    hosts = parsed_urls.select("host").distinct()
    g = _host_g(F.col("host"))
    lang = _host_lang(F.col("host"))
    nl = F.lit("\n")
    decoy = F.when(
        g % 5 == 1, F.lit("User-agent: badbot\nDisallow: /\n\n")
    ).otherwise(F.lit(""))
    star_rules = F.concat(
        F.when(g == 9, F.lit("Disallow: /\n")).otherwise(F.lit("")),
        F.when(
            g % 3 == 0, F.concat(F.lit("Disallow: /"), lang, F.lit("/\n"))
        ).otherwise(F.lit("")),
        F.when(
            g % 2 == 0, F.concat(F.lit("Allow: /"), lang, F.lit("/doc-\n"))
        ).otherwise(F.lit("")),
        # group-scoped non-rule field: odd-g hosts throttle crawlers
        F.when(
            g % 2 == 1,
            F.concat(
                F.lit("Crawl-delay: "), (1 + g % 4).cast("string"), nl
            ),
        ).otherwise(F.lit("")),
        F.lit("Disallow: /tmp/"),
    )
    # Sitemap is a FILE-scoped field (the sitemaps.org convention; RFC
    # 9309 §2.2.4 carries unknown lines as other records) — synthesized
    # at the TOP of the file for even g and after the * group for odd
    # g, so a parser that only looked inside one group would miss half
    # of them either way
    sitemap_line = F.concat(
        F.lit("Sitemap: https://"), F.col("host"),
        F.lit("/sitemap-"), g.cast("string"), F.lit(".xml"),
    )
    txt = F.concat(
        F.lit("# synthetic robots for "), F.col("host"), nl,
        F.when(g % 2 == 0, F.concat(sitemap_line, nl)).otherwise(F.lit("")),
        decoy,
        F.lit("User-agent: *"), nl,
        star_rules,
        F.when(g % 2 == 1, F.concat(nl, sitemap_line)).otherwise(F.lit("")),
    )
    return hosts.select("host", txt.alias("robots_txt"))


# One User-agent:* group body: the start-group line is anchored to a
# LINE start (a comment merely ending in "user-agent: *" must not
# hijack the group); additional consecutive User-agent lines head the
# same group and are skipped; the body ends at the NEXT User-agent
# line or end-of-input — RFC 9309's ABNF group model.  The terminator
# is a LOOKAHEAD so extract_all can match every * group in the file
# (the next group's own User-agent line stays unconsumed); \z is the
# end-of-input anchor ((?m) makes $ a line anchor, which would
# truncate the body at its first line).
STAR_GROUP_RE = (
    r"(?smi)^[ \t]*user-agent:[ \t]*\*[ \t]*\r?\n"
    r"((?:[ \t]*user-agent:[^\n]*\n)*.*?)"
    r"(?=\r?\n[ \t]*user-agent:|\z)"
)


def _star_group_body(txt: Column) -> Column:
    """ALL ``User-agent: *`` group bodies, merged.

    RFC 9309 §2.2.1: rules from every group matching the same agent
    COMBINE — a file may declare ``*`` groups in several places and a
    first-match-only parse silently drops the later ones (fails open).
    """
    return F.array_join(
        F.regexp_extract_all(txt, F.lit(STAR_GROUP_RE), 1), "\n"
    )


def parse_robots_rules(
    robots: DataFrame, *, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> exploded (host, prefix, allow) rules of the
    ``User-agent: *`` group.

    Row-local: one regexp pulls the ``*`` group, a second pulls its
    ``Allow:`` / ``Disallow:`` lines.  Group delimiting follows RFC
    9309's ABNF: a group runs until the NEXT ``User-agent`` start-group
    line (or end-of-file) — NOT until a blank line.  Real files
    routinely omit blank lines between groups (a blank-line-delimited
    parse would leak the next agent's rules into ``*``) and may carry
    blank lines inside a group (which would silently truncate it);
    either miss FAILS OPEN or CLOSED on rules the crawler never wrote
    for ``*``.  Additional consecutive ``User-agent`` lines directly
    under the ``*`` line head the same group (RFC 9309 §2.1) and are
    skipped, not terminators.  Field names are case-insensitive and
    lines may end in ``\\r\\n`` (both required by §2.1-2.2; a parser
    that fails to match would fail open — zero rules means everything
    fetchable).  ``#`` comments and unknown fields never match the
    rule-line regexp.  ``allow`` is int (1 = Allow) — integer
    end-to-end for the cross-engine check.  Hosts whose ``*`` group has
    no rules simply emit no rows (explode, not explode_outer: an absent
    group means no restrictions, same as an absent file — RFC 9309
    §2.3.1.2)."""
    sect = _star_group_body(F.col(txt_col))
    # leading whitespace tolerated: the ABNF is rule = *WS identifier
    lines = F.regexp_extract_all(
        sect, F.lit(r"(?mi)^[ \t]*(?:dis)?allow:[ \t]*(\S+)"), 0
    )
    rules = F.transform(
        lines,
        lambda ln: F.struct(
            F.regexp_extract(
                ln, r"(?i)^[ \t]*(?:dis)?allow:[ \t]*(\S+)", 1
            ).alias("prefix"),
            # NOT ltrim().startswith(): Spark's ltrim strips spaces
            # only, so a tab-indented Allow would classify as Disallow
            F.when(ln.rlike(r"(?i)^[ \t]*allow:"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("allow"),
        ),
    )
    return (
        robots.select(F.col(host_col).alias("host"), F.explode(rules).alias("r"))
        .select("host", F.col("r.prefix").alias("prefix"), F.col("r.allow").alias("allow"))
    )


def robots_txt_gate(
    parsed_urls: DataFrame,
    robots: DataFrame,
    *,
    path_col: str = "path",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Longest-match robots resolution per URL row.

    ``parsed_urls`` carries (doc_id, url, host, path) —
    :func:`urls.parse_urls` output.  ``robots`` is (host, robots_txt).
    The rules are parsed, re-packed to one bounded array per host (a
    rules-table-sized aggregate — robots files are small by
    construction, see module docstring), equi-joined on host, and the
    winner picked ROW-LOCALLY: max(struct(prefix_len, allow)) over the
    matching rules, so length wins and Allow wins length ties (RFC 9309
    §2.2.2).  No rule matching (or no robots row for the host) means
    fetchable — the REP default.

    Output: doc_id, url, fetchable (int), match_len / match_allow (the
    winning rule, NULL when nothing matched).  ``keep`` carries extra
    ``parsed_urls`` columns through (projection, no re-join — the
    datagen convention), so composed jobs like the crawl frontier read
    the host without paying a doc_id join back.  One corpus shuffle
    (the host join, broadcast when small); the longest-match itself
    adds none.
    """
    per_host = (
        parse_robots_rules(robots)
        .groupBy("host")
        .agg(F.collect_list(F.struct("prefix", "allow")).alias("_rs"))
    )
    j = parsed_urls.join(per_host, "host", "left")
    cand = F.transform(
        F.filter(
            F.coalesce(
                F.col("_rs"),
                F.array().cast("array<struct<prefix:string,allow:int>>"),
            ),
            lambda r: F.col(path_col).startswith(r.prefix),
        ),
        lambda r: F.struct(
            F.length(r.prefix).alias("len"), r.allow.alias("allow")
        ),
    )
    w = F.array_max(cand)
    return j.select(
        "doc_id",
        "url",
        *keep,
        F.when(w.isNull() | (w.allow == 1), F.lit(1))
        .otherwise(F.lit(0))
        .alias("fetchable"),
        w.getField("len").alias("match_len"),
        w.getField("allow").alias("match_allow"),
    )


def parse_crawl_delay(
    robots: DataFrame, *, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> (host, crawl_delay) from the ``*`` group.

    ``Crawl-delay`` is a de-facto extension crawlers honor per GROUP
    (it throttles the agent the group addresses), so the lookup is
    scoped to the merged ``*`` groups (:func:`_star_group_body`) — a
    delay in another agent's group must NOT throttle us; the first
    delay among the merged groups wins.  Real files use fractional
    values ('Crawl-delay: 0.5'); the integer budget rounds UP and
    clamps to >= 1 s (truncating 0.5 to 0 would hand a THROTTLED host
    a zero fetch budget — the opposite of what the field says).  NULL
    when the groups carry no delay (no throttle).  Row-local."""
    sect = _star_group_body(F.col(txt_col))
    raw = F.nullif(
        F.regexp_extract(
            sect, r"(?mi)^[ \t]*crawl-delay:[ \t]*(\d+(?:\.\d+)?)", 1
        ),
        F.lit(""),
    )
    # NOT greatest(1, ceil(...)): Spark's greatest SKIPS nulls, which
    # would turn an absent delay into 1 instead of NULL (no throttle)
    delay = F.when(
        raw.isNotNull(),
        F.greatest(F.lit(1).cast("bigint"), F.ceil(raw.try_cast("double"))),
    ).try_cast("int")
    return robots.select(
        F.col(host_col).alias("host"), delay.alias("crawl_delay")
    )


def parse_sitemaps(
    robots: DataFrame, *, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> exploded (host, sitemap_url).

    ``Sitemap`` is FILE-scoped (the sitemaps.org convention) — matched
    anywhere in the file, never restricted to a group, any number of
    occurrences.  Hosts without one emit no rows.  Row-local."""
    urls = F.regexp_extract_all(
        F.col(txt_col), F.lit(r"(?mi)^[ \t]*sitemap:[ \t]*(\S+)"), 1
    )
    return robots.select(
        F.col(host_col).alias("host"), F.explode(urls).alias("sitemap_url")
    )


def crawl_budget(
    parsed_urls: DataFrame, robots: DataFrame
) -> DataFrame:
    """Per-host crawl scheduling budget: how long a polite single
    connection needs to fetch every known URL of the host.

    ``parsed_urls`` carries (host, ...) — one row per frontier URL;
    ``robots`` is (host, robots_txt).  Output (host, n_urls,
    crawl_delay, est_fetch_seconds = n_urls * coalesce(delay, 1)) —
    the frontier-sharding signal a crawl scheduler partitions by (a
    host with 10^6 URLs and Crawl-delay: 4 is a 46-day crawl: it must
    be sharded by time, not by machine).  One corpus aggregate on host
    + a host-count-sized join; all-integer arithmetic."""
    per_host = parsed_urls.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_urls")
    )
    delays = parse_crawl_delay(robots)
    j = per_host.join(delays, "host", "left")
    return j.select(
        "host",
        "n_urls",
        "crawl_delay",
        (F.col("n_urls") * F.coalesce(F.col("crawl_delay"), F.lit(1)))
        .cast("bigint")
        .alias("est_fetch_seconds"),
    )


def crawl_frontier(
    parsed_urls: DataFrame,
    robots: DataFrame,
    *,
    blocked: tuple[str, ...] | None = None,
) -> DataFrame:
    """The composed crawl-planning job: blocklist gate -> robots gate
    -> per-host budget, one pipeline.

    ``parsed_urls`` is :func:`urls.parse_urls` output (carrying
    ``domain``, ``host``, ``path``); ``robots`` is (host, robots_txt).
    Blocklisted registered domains drop first (broadcast anti-join —
    the cheapest gate runs before any robots work), survivors resolve
    through the RFC 9309 longest-match (host carried through the gate's
    ``keep`` projection, no join back), and only fetchable URLs enter
    the per-host budget.  Shuffle inventory of the WHOLE pipeline: the
    host equi-join + the final host aggregate — everything else is
    broadcast or row-local, so the plan is two corpus-sized exchanges
    at any scale."""
    from cloud_ocr_summarizer_spark.operators.urls import domain_gate

    kept = (
        domain_gate(parsed_urls)
        if blocked is None  # urls.BLOCKED_DOMAINS, domain_gate's default
        else domain_gate(parsed_urls, blocked=blocked)
    )
    gated = robots_txt_gate(kept, robots, keep=("host",))
    return crawl_budget(gated.where(F.col("fetchable") == 1), robots)
