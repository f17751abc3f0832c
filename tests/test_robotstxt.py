"""robots.txt parse + longest-match gate (RFC 9309 resolution order).

Hand-built robots files pin the semantics the synthesized corpus can't
isolate one at a time: agent-group scoping, comment tolerance, the
Allow-wins-length-ties rule, and the no-rules / no-file defaults.
"""

from pyspark.sql import functions as F

from cloud_ocr_summarizer_spark.operators.robotstxt import (
    derive_robots_txt_from_documents,
    parse_robots_rules,
    robots_txt_gate,
)


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, robots_txt string")


def _urls(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, url string, host string, path string"
    )


def test_parser_scopes_to_star_group_and_ignores_comments(spark):
    txt = (
        "# top comment\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Allow: /public/\n"
        "Disallow: /private/"
    )
    rules = {
        (r.prefix, r.allow)
        for r in parse_robots_rules(_robots(spark, [("h", txt)])).collect()
    }
    # the badbot group's Disallow: / must NOT leak into the * rules
    assert rules == {("/public/", 1), ("/private/", 0)}


def test_star_group_terminates_at_next_group(spark):
    txt = (
        "User-agent: *\n"
        "Disallow: /a/\n"
        "\n"
        "User-agent: otherbot\n"
        "Disallow: /b/"
    )
    rules = {
        (r.prefix, r.allow)
        for r in parse_robots_rules(_robots(spark, [("h", txt)])).collect()
    }
    assert rules == {("/a/", 0)}


def test_adjacent_group_without_blank_line_does_not_leak(spark):
    """RFC 9309 delimits groups by User-agent lines, NOT blank lines —
    real files routinely omit the blank separator.  A blank-line-
    delimited parse would attribute archiver's 'Disallow: /' to *."""
    txt = (
        "User-agent: *\n"
        "Disallow: /tmp/\n"
        "User-agent: archiver\n"
        "Disallow: /\n"
    )
    rules = {
        (r.prefix, r.allow)
        for r in parse_robots_rules(_robots(spark, [("h", txt)])).collect()
    }
    assert rules == {("/tmp/", 0)}


def test_blank_line_inside_group_does_not_truncate(spark):
    """Blank lines are not group terminators: rules after an interior
    blank line still belong to the * group (dropping them fails open)."""
    txt = "User-agent: *\nDisallow: /a/\n\nDisallow: /b/\n"
    rules = {
        (r.prefix, r.allow)
        for r in parse_robots_rules(_robots(spark, [("h", txt)])).collect()
    }
    assert rules == {("/a/", 0), ("/b/", 0)}


def test_stacked_user_agent_lines_head_one_group(spark):
    """Consecutive User-agent lines share the group (RFC 9309 §2.1):
    a UA line directly under the * line is not a terminator."""
    txt = (
        "User-agent: *\n"
        "User-agent: goodbot\n"
        "Disallow: /x/\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
    )
    rules = {
        (r.prefix, r.allow)
        for r in parse_robots_rules(_robots(spark, [("h", txt)])).collect()
    }
    assert rules == {("/x/", 0)}


def test_longest_match_and_allow_tie_break(spark):
    txt = (
        "User-agent: *\n"
        "Disallow: /dir/\n"
        "Allow: /dir/page-\n"
        "Disallow: /tie/\n"
        "Allow: /tie/"  # same length as the Disallow: Allow wins the tie
    )
    robots = _robots(spark, [("h", txt)])
    urls = _urls(
        spark,
        [
            (1, "u1", "h", "/dir/page-1.html"),  # longer Allow wins
            (2, "u2", "h", "/dir/other.html"),  # only the Disallow matches
            (3, "u3", "h", "/tie/x"),  # equal lengths -> Allow wins
            (4, "u4", "h", "/elsewhere"),  # nothing matches -> fetchable
            (5, "u5", "nohost", "/dir/page-1.html"),  # no robots row
        ],
    )
    got = {
        r.doc_id: (r.fetchable, r.match_len, r.match_allow)
        for r in robots_txt_gate(urls, robots).collect()
    }
    assert got[1] == (1, 10, 1)
    assert got[2] == (0, 5, 0)
    assert got[3] == (1, 5, 1)
    assert got[4] == (1, None, None)
    assert got[5] == (1, None, None)


def test_parser_tolerates_crlf_and_field_case(spark):
    """RFC 9309 §2.1-2.2: field names are case-insensitive and lines
    may end in CRLF.  A parser that missed either would FAIL OPEN —
    zero rules parsed means every disallowed URL reads as fetchable."""
    txt = (
        "User-Agent: *\r\n"
        "disallow: /private/\r\n"
        "ALLOW: /private/pub-\r\n"
        "\r\n"
        "user-agent: otherbot\r\n"
        "Disallow: /\r\n"
    )
    rules = {
        (r.prefix, r.allow)
        for r in parse_robots_rules(_robots(spark, [("h", txt)])).collect()
    }
    assert rules == {("/private/", 0), ("/private/pub-", 1)}


def test_empty_star_group_means_unrestricted(spark):
    txt = "User-agent: *\n"  # group exists but carries no rules
    robots = _robots(spark, [("h", txt)])
    urls = _urls(spark, [(1, "u", "h", "/anything")])
    row = robots_txt_gate(urls, robots).collect()[0]
    assert (row.fetchable, row.match_len) == (1, None)


def test_derived_corpus_gate_matches_host_arithmetic(spark):
    """On the synthesized corpus the gate must reproduce the synthesis
    arithmetic: g==9 and g%3==0 hosts block their doc paths UNLESS the
    g%2==0 Allow override outranks (so blocked iff g in {3, 9})."""
    docs = spark.createDataFrame(
        [(i, "en", f"src{i % 3}") for i in range(40)],
        "doc_id long, lang string, source string",
    )
    from cloud_ocr_summarizer_spark.operators.urls import (
        derive_urls_from_documents,
        parse_urls,
    )

    parsed = parse_urls(derive_urls_from_documents(docs))
    robots = derive_robots_txt_from_documents(docs)
    got = {
        r.doc_id: r.fetchable
        for r in robots_txt_gate(parsed, robots).collect()
    }
    assert got == {i: 0 if i % 10 in (3, 9) else 1 for i in range(40)}


def test_gate_plan_is_single_corpus_shuffle(spark):
    """The longest-match is row-local: the ONLY corpus-side exchange in
    the optimized plan is the host join (plus the rules-side prep) — no
    per-URL aggregation or window over the corpus."""
    docs = spark.createDataFrame(
        [(i, "en", "s") for i in range(20)],
        "doc_id long, lang string, source string",
    )
    from cloud_ocr_summarizer_spark.operators.urls import (
        derive_urls_from_documents,
        parse_urls,
    )

    parsed = parse_urls(derive_urls_from_documents(docs))
    gate = robots_txt_gate(parsed, derive_robots_txt_from_documents(docs))
    plan = gate._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan
    # the longest-match stayed a row-local expression (array_max over
    # the filtered rules array — CollapseProject inlines one copy per
    # output column; codegen subexpression elimination dedups at run
    # time), never an Aggregate or Window over the url side
    assert "array_max" in plan


def test_crawl_delay_is_group_scoped(spark):
    """A Crawl-delay in another agent's group must NOT throttle us; a
    missing delay is NULL (no throttle), and the * group's own delay
    is read case-insensitively."""
    from cloud_ocr_summarizer_spark.operators.robotstxt import (
        parse_crawl_delay,
    )

    rows = [
        ("a", "User-agent: slowbot\nCrawl-delay: 9\nUser-agent: *\n"
              "crawl-DELAY: 3\nDisallow: /x/"),
        ("b", "User-agent: *\nDisallow: /x/\nUser-agent: slowbot\n"
              "Crawl-delay: 9"),
        ("c", "User-agent: otherbot\nDisallow: /"),  # no * group at all
    ]
    got = {
        r.host: r.crawl_delay
        for r in parse_crawl_delay(
            spark.createDataFrame(rows, "host string, robots_txt string")
        ).collect()
    }
    assert got == {"a": 3, "b": None, "c": None}


def test_sitemaps_are_file_scoped_and_repeatable(spark):
    """Sitemap lines match anywhere in the file (before the groups,
    inside one, after them) and every occurrence is emitted."""
    from cloud_ocr_summarizer_spark.operators.robotstxt import (
        parse_sitemaps,
    )

    txt = (
        "Sitemap: https://h/s1.xml\n"
        "User-agent: *\n"
        "Disallow: /x/\n"
        "sitemap: https://h/s2.xml\n"
        "User-agent: otherbot\n"
        "Disallow: /\n"
        "Sitemap: https://h/s3.xml"
    )
    got = sorted(
        r.sitemap_url
        for r in parse_sitemaps(_robots(spark, [("h", txt)])).collect()
    )
    assert got == [
        "https://h/s1.xml", "https://h/s2.xml", "https://h/s3.xml",
    ]
    assert parse_sitemaps(_robots(spark, [("h", "User-agent: *\n")])).count() == 0


def test_crawl_budget_arithmetic(spark):
    from cloud_ocr_summarizer_spark.operators.robotstxt import crawl_budget

    urls = _urls(
        spark,
        [(1, "u1", "slow", "/a"), (2, "u2", "slow", "/b"),
         (3, "u3", "fast", "/c"), (4, "u4", "norobots", "/d")],
    )
    robots = _robots(
        spark,
        [("slow", "User-agent: *\nCrawl-delay: 4\nDisallow: /tmp/"),
         ("fast", "User-agent: *\nDisallow: /tmp/")],
    )
    got = {
        r.host: (r.n_urls, r.crawl_delay, r.est_fetch_seconds)
        for r in crawl_budget(urls, robots).collect()
    }
    assert got == {
        "slow": (2, 4, 8),       # 2 URLs x 4 s
        "fast": (1, None, 1),    # no delay -> 1 s/URL
        "norobots": (1, None, 1),  # no robots row at all
    }


def test_derived_corpus_budget_matches_host_arithmetic(spark):
    """On the synthesized corpus: odd-g hosts carry delay 1 + g%4,
    even-g hosts none — and the delay parse must not be confused by
    the sitemap/comment/decoy lines around the group."""
    from cloud_ocr_summarizer_spark.operators.robotstxt import (
        crawl_budget,
        derive_robots_txt_from_documents,
    )
    from cloud_ocr_summarizer_spark.operators.urls import (
        derive_urls_from_documents,
        parse_urls,
    )

    docs = spark.createDataFrame(
        [(i, "en", "s") for i in range(40)],
        "doc_id long, lang string, source string",
    )
    parsed = parse_urls(derive_urls_from_documents(docs))
    got = {
        r.host: r.crawl_delay
        for r in crawl_budget(
            parsed, derive_robots_txt_from_documents(docs, parsed_urls=parsed)
        ).collect()
    }
    for host, delay in got.items():
        g = int(host.split(".example-")[1].split(".")[0])
        assert delay == (1 + g % 4 if g % 2 == 1 else None), host


def test_gate_keep_passes_columns_through(spark):
    from cloud_ocr_summarizer_spark.operators.robotstxt import (
        robots_txt_gate,
    )

    urls = _urls(spark, [(1, "u1", "h", "/a"), (2, "u2", "i", "/b")])
    robots = _robots(spark, [("h", "User-agent: *\nDisallow: /a")])
    got = {
        r.doc_id: (r.host, r.fetchable)
        for r in robots_txt_gate(urls, robots, keep=("host",)).collect()
    }
    assert got == {1: ("h", 0), 2: ("i", 1)}


def test_crawl_frontier_matches_python_model(spark):
    """The composed pipeline (blocklist -> robots gate -> budget) must
    reproduce an independent pure-Python recomputation of every stage
    over the derived corpus."""
    from cloud_ocr_summarizer_spark.operators.robotstxt import (
        crawl_frontier,
        derive_robots_txt_from_documents,
    )
    from cloud_ocr_summarizer_spark.operators.urls import (
        derive_urls_from_documents,
        parse_urls,
    )

    n = 60
    docs = spark.createDataFrame(
        [(i, "en", "s") for i in range(n)],
        "doc_id long, lang string, source string",
    )
    parsed = parse_urls(derive_urls_from_documents(docs))
    got = {
        r.host: (r.n_urls, r.crawl_delay, r.est_fetch_seconds)
        for r in crawl_frontier(
            parsed, derive_robots_txt_from_documents(docs, parsed_urls=parsed)
        ).collect()
    }
    expected = {}
    for i in range(n):
        g = i % 10
        tld = "co.uk" if i % 11 == 3 else ("com.au" if i % 11 == 7 else "com")
        host = f"s-en.example-{g}.{tld}"
        if f"example-{g}.{tld}" in (
            "example-2.com", "example-5.de", "example-8.cn"
        ):
            continue  # blocklist gate
        if g in (3, 9):
            continue  # robots gate: blocked unless the Allow overrides
        expected[host] = expected.get(host, 0) + 1
    assert got.keys() == expected.keys()
    for host, n_urls in expected.items():
        g = int(host.split(".example-")[1].split(".")[0])
        delay = 1 + g % 4 if g % 2 == 1 else None
        assert got[host] == (n_urls, delay, n_urls * (delay or 1)), host


def test_crawl_frontier_plan_has_no_docid_exchange(spark):
    """The composed pipeline never re-keys the corpus by doc_id: host
    rides the gate's keep= projection, so the only exchanges are
    host-keyed (the robots equi-join + the budget aggregate, plus the
    host-count-sized rules prep) and the blocklist broadcast."""
    from cloud_ocr_summarizer_spark.operators.robotstxt import (
        crawl_frontier,
        derive_robots_txt_from_documents,
    )
    from cloud_ocr_summarizer_spark.operators.urls import (
        derive_urls_from_documents,
        parse_urls,
    )

    docs = spark.createDataFrame(
        [(i, "en", "s") for i in range(30)],
        "doc_id long, lang string, source string",
    )
    parsed = parse_urls(derive_urls_from_documents(docs))
    f = crawl_frontier(
        parsed, derive_robots_txt_from_documents(docs, parsed_urls=parsed)
    )
    plan = f._jdf.queryExecution().executedPlan().toString()
    import re

    keys = re.findall(r"Exchange hashpartitioning\(([a-zA-Z_]+)", plan)
    assert keys and all(k == "host" for k in keys), keys
    assert plan.count("BroadcastExchange") == 1  # the blocklist gate
    assert "Window" not in plan


def test_multiple_star_groups_merge(spark):
    """RFC 9309 §2.2.1: rules from EVERY group matching the agent
    combine — a first-match-only parse drops the later * group's
    rules (fails open) and its Crawl-delay."""
    from cloud_ocr_summarizer_spark.operators.robotstxt import (
        parse_crawl_delay,
    )

    txt = (
        "User-agent: *\n"
        "Disallow: /a/\n"
        "User-agent: bot\n"
        "Disallow: /x/\n"
        "User-agent: *\n"
        "Crawl-delay: 5\n"
        "Disallow: /b/"
    )
    robots = _robots(spark, [("h", txt)])
    rules = {(r.prefix, r.allow) for r in parse_robots_rules(robots).collect()}
    assert rules == {("/a/", 0), ("/b/", 0)}
    assert parse_crawl_delay(robots).collect()[0].crawl_delay == 5


def test_comment_mentioning_user_agent_star_does_not_hijack(spark):
    """The start-group line is anchored to a LINE start: a comment that
    merely ends in 'user-agent: *' must not open the * group (which
    would attribute the next agent's rules to us)."""
    txt = (
        "# default group is user-agent: *\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
        "User-agent: *\n"
        "Allow: /ok/"
    )
    rules = {
        (r.prefix, r.allow)
        for r in parse_robots_rules(_robots(spark, [("h", txt)])).collect()
    }
    assert rules == {("/ok/", 1)}


def test_indented_lines_are_parsed(spark):
    """RFC 9309's ABNF allows leading whitespace on every line; an
    indented Disallow silently dropped fails open."""
    from cloud_ocr_summarizer_spark.operators.robotstxt import (
        parse_crawl_delay,
        parse_sitemaps,
    )

    txt = (
        "  Sitemap: https://h/s.xml\n"
        "User-agent: *\n"
        "  Disallow: /private/\n"
        "\tAllow: /private/pub-\n"
        "\tCrawl-delay: 7"
    )
    robots = _robots(spark, [("h", txt)])
    rules = {(r.prefix, r.allow) for r in parse_robots_rules(robots).collect()}
    assert rules == {("/private/", 0), ("/private/pub-", 1)}
    assert parse_crawl_delay(robots).collect()[0].crawl_delay == 7
    assert [r.sitemap_url for r in parse_sitemaps(robots).collect()] == [
        "https://h/s.xml"
    ]


def test_fractional_crawl_delay_rounds_up_and_clamps(spark):
    """'Crawl-delay: 0.5' must budget 1 s/URL, not 0 (integer
    truncation would hand a THROTTLED host a zero fetch budget);
    absent delay stays NULL — greatest() must not swallow it."""
    from cloud_ocr_summarizer_spark.operators.robotstxt import (
        parse_crawl_delay,
    )

    rows = [
        ("half", "User-agent: *\nCrawl-delay: 0.5\nDisallow: /t/"),
        ("frac", "User-agent: *\nCrawl-delay: 1.9\nDisallow: /t/"),
        ("whole", "User-agent: *\nCrawl-delay: 3\nDisallow: /t/"),
        ("none", "User-agent: *\nDisallow: /t/"),
    ]
    got = {
        r.host: r.crawl_delay
        for r in parse_crawl_delay(
            spark.createDataFrame(rows, "host string, robots_txt string")
        ).collect()
    }
    assert got == {"half": 1, "frac": 2, "whole": 3, "none": None}
