"""Seeded-random fuzz: the robots.txt parsers vs a pure-Python model.

The synthesized corpus exercises one fixed file shape; real files mix
indentation, CRLF, case, stacked/adjacent groups, junk fields, and
fractional delays.  Build 250 random files from those atoms and check
``parse_robots_rules`` / ``parse_crawl_delay`` / ``parse_sitemaps`` /
``robots_txt_gate`` against a line-based Python implementation of the
SAME documented semantics (RFC 9309 group model: groups delimited by
User-agent lines, stacked heads share a group, ALL * groups merge,
fields case-insensitive and indent/CRLF-tolerant)."""

import math
import random
import re

import pytest


@pytest.fixture(scope="module")
def rng():
    return random.Random(777)


_AGENTS = ["*", "* ", "badbot", "archiver", "*x", "* extra"]
_PATHS = ["/", "/a/", "/a/b", "/tmp/", "/p-1.html", "/x?q=1"]
_INDENTS = ["", " ", "\t", "  "]
_FIELD_CASE = [str.lower, str.upper, str.title, lambda s: s]


def _rand_line(rng) -> str:
    kind = rng.randrange(8)
    ind = rng.choice(_INDENTS)
    if kind == 0:
        field = rng.choice(_FIELD_CASE)("User-agent")
        return f"{ind}{field}:{rng.choice(['', ' '])}{rng.choice(_AGENTS)}"
    if kind == 1 or kind == 2:
        field = rng.choice(_FIELD_CASE)(rng.choice(["Allow", "Disallow"]))
        return f"{ind}{field}:{rng.choice(['', ' '])}{rng.choice(_PATHS)}"
    if kind == 3:
        field = rng.choice(_FIELD_CASE)("Crawl-delay")
        v = rng.choice(["3", "0.5", "1.9", "0", "7", "abc", "5abc"])
        return f"{ind}{field}: {v}"
    if kind == 4:
        field = rng.choice(_FIELD_CASE)("Sitemap")
        return f"{ind}{field}: https://h/s{rng.randrange(4)}.xml"
    if kind == 5:
        return rng.choice(
            ["# note user-agent: *", "# plain comment", "Host: example.com",
             "Disallowed: /x", "allow /nocolon"]
        )
    return rng.choice(["", " "])


def _rand_file(rng) -> str:
    n = rng.randrange(0, 14)
    eol = rng.choice(["\n", "\r\n"])
    body = eol.join(_rand_line(rng) for _ in range(n))
    return body + (eol if rng.random() < 0.5 and body else "")


# --- the pure-Python model of the documented semantics ---------------

_UA = re.compile(r"^[ \t]*user-agent:[ \t]*(.*)$", re.I)
_RULE = re.compile(r"^[ \t]*((?:dis)?allow):[ \t]*(\S+)", re.I)
_DELAY = re.compile(r"^[ \t]*crawl-delay:[ \t]*(\d+(?:\.\d+)?)", re.I)
_SITEMAP = re.compile(r"^[ \t]*sitemap:[ \t]*(\S+)", re.I)


def _model_star_lines(txt: str) -> list[str]:
    """Body lines of every * group, in file order."""
    out: list[str] = []
    in_head = False
    star = False
    collecting = False
    for raw in txt.split("\n"):
        line = raw[:-1] if raw.endswith("\r") else raw
        m = _UA.match(line)
        if m:
            if not in_head:  # a UA line after a body starts a NEW group
                in_head = True
                star = False
                collecting = False
            if re.fullmatch(r"\*[ \t]*", m.group(1) or ""):
                star = True
            continue
        if in_head:  # first non-UA line: the head's body begins
            in_head = False
            collecting = star
        if collecting:
            out.append(line)
    return out


def _model_rules(txt: str) -> list[tuple[str, int]]:
    rules = []
    for line in _model_star_lines(txt):
        m = _RULE.match(line)
        if m:
            rules.append(
                (m.group(2), 1 if m.group(1).lower() == "allow" else 0)
            )
    return rules


def _model_delay(txt: str):
    for line in _model_star_lines(txt):
        m = _DELAY.match(line)
        if m:
            return max(1, math.ceil(float(m.group(1))))
    return None


def _model_sitemaps(txt: str) -> list[str]:
    out = []
    for raw in txt.split("\n"):
        line = raw[:-1] if raw.endswith("\r") else raw
        m = _SITEMAP.match(line)
        if m:
            out.append(m.group(1))
    return out


def _model_gate(rules, path):
    cand = [(len(p), a) for p, a in rules if path.startswith(p)]
    if not cand:
        return 1, None, None
    ln, allow = max(cand)
    return (1 if allow == 1 else 0), ln, allow


def test_robots_parsers_fuzz_vs_python(spark, rng):
    from cloud_ocr_summarizer_spark.operators.robotstxt import (
        parse_crawl_delay,
        parse_robots_rules,
        parse_sitemaps,
    )

    files = [(i, _rand_file(rng)) for i in range(250)]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in files], "host string, robots_txt string"
    )

    got_rules: dict[str, list] = {str(i): [] for i, _ in files}
    for r in parse_robots_rules(df).collect():
        got_rules[r.host].append((r.prefix, r.allow))
    got_delay = {
        r.host: r.crawl_delay for r in parse_crawl_delay(df).collect()
    }
    got_maps: dict[str, list] = {str(i): [] for i, _ in files}
    for r in parse_sitemaps(df).collect():
        got_maps[r.host].append(r.sitemap_url)

    for i, txt in files:
        h = str(i)
        assert sorted(got_rules[h]) == sorted(_model_rules(txt)), (i, txt)
        assert got_delay[h] == _model_delay(txt), (i, txt)
        assert sorted(got_maps[h]) == sorted(_model_sitemaps(txt)), (i, txt)


def test_robots_gate_fuzz_vs_python(spark, rng):
    from cloud_ocr_summarizer_spark.operators.robotstxt import (
        robots_txt_gate,
    )

    files = [(i, _rand_file(rng)) for i in range(120)]
    robots = spark.createDataFrame(
        [(str(i), t) for i, t in files], "host string, robots_txt string"
    )
    url_rows = []
    expected = {}
    doc = 0
    for i, txt in files:
        rules = _model_rules(txt)
        for _ in range(3):
            path = rng.choice(_PATHS + ["/a/b/c", "/elsewhere", "/p-1.htmlx"])
            url_rows.append((doc, f"u{doc}", str(i), path))
            expected[doc] = _model_gate(rules, path)
            doc += 1
    urls = spark.createDataFrame(
        url_rows, "doc_id long, url string, host string, path string"
    )
    got = {
        r.doc_id: (r.fetchable, r.match_len, r.match_allow)
        for r in robots_txt_gate(urls, robots).collect()
    }
    assert got == expected
