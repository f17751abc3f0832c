"""Seeded-random fuzz: feed + head-meta parsers vs pure-Python models.

Same policy as tests/test_fuzz_webstruct.py: the synthesized corpora
exercise one fixed shape each; real files mix quote styles, attribute
orders, comments, entity escapes, junk between blocks and missing
fields.  Build random files from those atoms and check
``parse_feed_entries`` / ``extract_head_meta`` against pure-Python
implementations of the SAME documented semantics (comment strip first,
head scoping first, first-match extraction, CDATA unwrap before entity
unescape, month-name validation, NULL-for-absent).
"""

import random
import re

import pytest


@pytest.fixture(scope="module")
def rng():
    return random.Random(77)


def _unescape(s: str) -> str:
    return s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


# ------------------------------------------------------------------ feeds

_MONTHS = (
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
)

_TITLES = [
    "<title>plain</title>",
    "<title>A &amp; B</title>",
    "<title><![CDATA[raw & <b>]]></title>",
    "<title><![CDATA[broken</title>",
    "<title></title>",
    "",
]
_RSS_DATES = [
    "<pubDate>Tue, 03 Feb 2026 00:00:00 GMT</pubDate>",
    "<pubDate>Mon, 15 Dec 2026 08:00:00 GMT</pubDate>",
    "<pubDate>Xxx, 09 Foo 2026 00:00:00 GMT</pubDate>",
    "<pubDate>garbage</pubDate>",
    "",
]
_ATOM_DATES = [
    "<updated>2026-02-03T00:00:00Z</updated>",
    "<updated>2026-12-15T08:00:00Z</updated>",
    "<updated>nope</updated>",
    "",
]


def _rss_item(rng) -> str:
    parts = [
        rng.choice(_TITLES),
        rng.choice(["<link>http://h/a?x=1&amp;y=2</link>", "<link>http://h/b</link>", ""]),
        rng.choice(["<guid>g-%d</guid>" % rng.randrange(99), "<id>i-%d</id>" % rng.randrange(99), ""]),
        rng.choice(_RSS_DATES),
    ]
    rng.shuffle(parts)
    return "<item>" + "\n".join(parts) + "</item>"


def _atom_entry(rng) -> str:
    parts = [
        rng.choice(_TITLES),
        rng.choice(
            ['<link href="http://h/a?x=1&amp;y=2"/>', "<link href='http://h/c'/>", ""]
        ),
        rng.choice(["<id>i-%d</id>" % rng.randrange(99), ""]),
        rng.choice(_ATOM_DATES),
    ]
    rng.shuffle(parts)
    return "<entry>" + "\n".join(parts) + "</entry>"


def _feed_file(rng) -> str:
    is_rss = rng.random() < 0.5
    chunks = []
    if is_rss:
        chunks.append('<rss version="2.0"><channel>')
    else:
        chunks.append('<feed xmlns="http://www.w3.org/2005/Atom">')
    for _ in range(rng.randrange(0, 5)):
        r = rng.random()
        if r < 0.2:
            chunks.append(
                "<!-- decoy <item><link>http://decoy/</link></item>"
                ' <entry><link href="http://decoy/"/></entry> -->'
            )
        elif r < 0.3:
            chunks.append(rng.choice(["junk", "<p>stray</p>", "\n"]))
        else:
            chunks.append(_rss_item(rng) if is_rss else _atom_entry(rng))
    chunks.append("</channel></rss>" if is_rss else "</feed>")
    return "\n".join(chunks)


def _model_title(inner: str):
    m = re.search(r"(?s)<title>(.*?)</title>", inner)
    raw = m.group(1) if m else ""
    if re.match(r"^<!\[CDATA\[", raw):
        c = re.match(r"(?s)^<!\[CDATA\[(.*)\]\]>$", raw)
        return (c.group(1) or None) if c else None
    return _unescape(raw) or None


def _model_date(inner: str):
    m = re.search(r"<updated>(\d{4}-\d{2}-\d{2})", inner)
    if m:
        return m.group(1)
    m = re.search(r"<pubDate>\w+, (\d{2}) (\w{3}) (\d{4})", inner)
    if m and m.group(2) in _MONTHS:
        return "%s-%02d-%s" % (m.group(3), _MONTHS.index(m.group(2)) + 1, m.group(1))
    return None


def _model_feed(xml: str):
    clean = re.sub(r"(?s)<!--.*?-->", "", xml)
    kind = "rss" if re.search(r"<rss[ >]", clean) else "atom"
    pat = r"(?s)<item>(.*?)</item>" if kind == "rss" else r"(?s)<entry>(.*?)</entry>"
    out = []
    for i, inner in enumerate(re.findall(pat, clean)):
        if kind == "rss":
            lm = re.search(r"(?s)<link>(.*?)</link>", inner)
        else:
            lm = re.search(r"""<link href=["']([^"']*)["']""", inner)
        link = (_unescape(lm.group(1)) or None) if lm else None
        gm = re.search(r"<guid>(.*?)</guid>", inner)
        im = re.search(r"<id>(.*?)</id>", inner)
        guid = (gm.group(1) or None) if gm else None
        if guid is None and im:
            guid = im.group(1) or None
        out.append((i + 1, kind, _model_title(inner), link, guid, _model_date(inner)))
    return out


def test_fuzz_feed_parser_matches_python_model(spark, rng):
    from cloud_ocr_summarizer_spark.operators.feeds import parse_feed_entries

    files = [(f"h{i}", _feed_file(rng)) for i in range(200)]
    rows = (
        parse_feed_entries(
            spark.createDataFrame(files, "host string, feed_xml string")
        )
        .orderBy("host", "pos")
        .collect()
    )
    got = {}
    for r in rows:
        got.setdefault(r.host, []).append(
            (r.pos, r.kind, r.title, r.link, r.guid, r.pub_date)
        )
    for h, xml in files:
        assert got.get(h, []) == _model_feed(xml), f"{h}: {xml!r}"


# -------------------------------------------------------------- head meta

_HEAD_TITLES = [
    "<title>plain</title>",
    "<title>A &amp; B</title>",
    "<title></title>",
    "",
]
_DESCS = [
    '<meta name="description" content="D1">',
    '<meta content="D2" name="description">',
    "<meta name='description' content='D3'>",
    '<meta name="description">',
    "",
]
_OGS = ['<meta property="og:title" content="OG"/>', ""]
_CANONS = [
    '<link rel="canonical" href="http://h/c?a=1&amp;b=2">',
    "<link rel='canonical' href='http://h/d'>",
    '<link rel="canonical">',
    "",
]
_CHARSETS = ['<meta charset="utf-8">', "<meta charset='latin-1'>", ""]


def _head_file(rng) -> str:
    parts = [
        rng.choice(_HEAD_TITLES),
        rng.choice(_DESCS),
        rng.choice(_OGS),
        rng.choice(_CANONS),
        rng.choice(_CHARSETS),
    ]
    rng.shuffle(parts)
    if rng.random() < 0.3:
        parts.insert(
            rng.randrange(len(parts)),
            "<!-- <title>Decoy</title> <meta name=\"description\" content=\"DX\"> -->",
        )
    body = "<body><title>Body decoy</title><p>text</p></body>"
    if rng.random() < 0.1:  # no head at all -> every field NULL
        return f"<html>{body}</html>"
    return f"<html><head>{''.join(parts)}</head>{body}</html>"


def _model_attr(head: str, key_attr: str, key_val: str):
    m = re.search(rf'(?i)<meta[^>]*{key_attr}=["\']{key_val}["\'][^>]*>', head)
    if not m:
        return None
    c = re.search(r"""content=["']([^"']*)["']""", m.group(0))
    return (c.group(1) or None) if c else None


def _model_head(html: str):
    hm = re.search(r"(?s)<head>(.*?)</head>", html)
    head = re.sub(r"(?s)<!--.*?-->", "", hm.group(1)) if hm else ""
    tm = re.search(r"(?s)<title>(.*?)</title>", head)
    title = (_unescape(tm.group(1)) or None) if tm else None
    cm = re.search(r"""(?i)<link[^>]*rel=["']canonical["'][^>]*>""", head)
    canon = None
    if cm:
        href = re.search(r"""href=["']([^"']*)["']""", cm.group(0))
        canon = (_unescape(href.group(1)) or None) if href else None
    sm = re.search(r"""(?i)<meta charset=["']([^"']+)["']""", head)
    return (
        title,
        _model_attr(head, "name", "description"),
        _model_attr(head, "property", "og:title"),
        canon,
        (sm.group(1) if sm else None),
    )


def test_fuzz_head_meta_matches_python_model(spark, rng):
    from cloud_ocr_summarizer_spark.operators.headmeta import extract_head_meta

    files = [(i, _head_file(rng)) for i in range(200)]
    rows = extract_head_meta(
        spark.createDataFrame(files, "doc_id long, html string"), keep=()
    ).collect()
    got = {
        r.doc_id: (r.title, r.description, r.og_title, r.canonical_url, r.charset)
        for r in rows
    }
    for i, html in files:
        assert got[i] == _model_head(html), f"doc {i}: {html!r}"
