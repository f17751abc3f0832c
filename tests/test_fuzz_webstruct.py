"""Seeded-random fuzz: sitemap + HTML-table parsers vs Python models.

The synthesized corpora exercise one fixed shape each; real files mix
tag attributes, comments, entity escapes, junk between blocks,
malformed numbers and truncated markup.  Build random files from those
atoms and check ``parse_sitemap_urls`` / ``extract_tables`` against
pure-Python implementations of the SAME documented semantics (comment
strip first, first-match field extraction, DECIMAL(5,3) half-up
priority parse, space-only trim — Spark's ``trim`` removes only
0x20, unlike ``str.strip``).
"""

import random
import re
from decimal import ROUND_HALF_UP, Decimal, InvalidOperation

import pytest


@pytest.fixture(scope="module")
def rng():
    return random.Random(4242)


# ---------------------------------------------------------------- sitemap

_LOCS = [
    "http://h/x.html",
    "https://h/a?b=1&amp;c=2",
    "http://h/&lt;odd&gt;",
    "  http://h/pad.html  ",
    "",
]
_LASTMODS = ["2026-01-02", "2026-1-5", "not-a-date", "20260102", ""]
_PRIORITIES = ["0.5", "1.0", "0.55", "12.345", "99.9999", "abc", "1.2.3", ""]


def _url_block(rng) -> str:
    parts = []
    if rng.random() < 0.9:
        parts.append(f"<loc>{rng.choice(_LOCS)}</loc>")
    if rng.random() < 0.6:
        parts.append(f"<lastmod>{rng.choice(_LASTMODS)}</lastmod>")
    if rng.random() < 0.6:
        parts.append(f"<priority>{rng.choice(_PRIORITIES)}</priority>")
    rng.shuffle(parts)
    sep = rng.choice(["", "\n", "\n  "])
    inner = sep.join(parts)
    if rng.random() < 0.15:  # attributed <url> tags never match
        return f'<url id="{rng.randrange(9)}">{inner}</url>'
    return f"<url>{inner}</url>"


def _sitemap_file(rng) -> str:
    chunks = ['<?xml version="1.0"?><urlset>']
    for _ in range(rng.randrange(0, 6)):
        r = rng.random()
        if r < 0.2:
            chunks.append(
                f"<!-- decoy <url><loc>http://decoy/{rng.randrange(9)}"
                "</loc></url> -->"
            )
        elif r < 0.3:
            chunks.append(rng.choice(["junk text", "<p>stray</p>", "\n\n"]))
        else:
            chunks.append(_url_block(rng))
    if rng.random() < 0.15:  # truncated tail: unclosed block must drop
        chunks.append("<url><loc>http://h/truncated")
    chunks.append("</urlset>")
    return rng.choice(["", "\n"]).join(chunks)


def _unescape(s: str) -> str:
    return s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


def _model_priority(block: str):
    m = re.search(r"<priority>\s*([0-9.]+)\s*</priority>", block)
    if not m or not m.group(1):
        return None
    try:
        d = Decimal(m.group(1))
    except InvalidOperation:
        return None
    q = d.quantize(Decimal("0.001"), rounding=ROUND_HALF_UP)
    if abs(q) >= Decimal("100"):  # decimal(5,3) overflow -> NULL
        return None
    return int(q * 1000)


def _model_sitemap(xml: str):
    clean = re.sub(r"(?s)<!--.*?-->", "", xml)
    out = []
    for i, block in enumerate(re.findall(r"(?s)<url>(.*?)</url>", clean)):
        loc = re.search(r"(?s)<loc>\s*(.*?)\s*</loc>", block)
        lastmod = re.search(r"<lastmod>\s*([0-9-]+)\s*</lastmod>", block)
        out.append(
            (
                i + 1,
                _unescape(loc.group(1)) if loc else "",
                (lastmod.group(1) or None) if lastmod else None,
                _model_priority(block),
            )
        )
    return out


def test_fuzz_sitemap_parser_matches_python_model(spark, rng):
    from cloud_ocr_summarizer_spark.operators.sitemap import (
        parse_sitemap_urls,
    )

    files = [(i, _sitemap_file(rng)) for i in range(200)]
    rows = (
        parse_sitemap_urls(
            spark.createDataFrame(files, "file_id long, sitemap_xml string")
        )
        .orderBy("file_id", "pos")
        .collect()
    )
    got = {}
    for r in rows:
        got.setdefault(r.file_id, []).append(
            (r.pos, r.loc, r.lastmod, r.priority_milli)
        )
    for i, xml in files:
        assert got.get(i, []) == _model_sitemap(xml), f"file {i}: {xml!r}"


# ------------------------------------------------------------ HTML tables

_CELL_BODIES = [
    "plain",
    "<span class=v>wrapped</span>",
    "a <b>b</b> c",
    "",
    "  spaced  ",
    "multi\nline",
    "&amp;",
]


def _table(rng) -> str:
    rows = []
    for _ in range(rng.randrange(0, 4)):
        tag = rng.choice(["td", "th", "td"])
        cells = "".join(
            f"<{tag}{rng.choice(['', ' align=l', ' class=x'])}>"
            f"{rng.choice(_CELL_BODIES)}</{tag}>"
            for _ in range(rng.randrange(0, 4))
        )
        rows.append(f"<tr{rng.choice(['', ' class=r'])}>{cells}</tr>")
    body = rng.choice(["", "\n"]).join(rows)
    if rng.random() < 0.4:
        body = f"<tbody>{body}</tbody>"
    if rng.random() < 0.3:
        body = f"<thead></thead>{body}"
    attr = rng.choice(["", " class=data", ' border="1"'])
    return f"<table{attr}>{body}</table>"


def _table_file(rng) -> str:
    chunks = ["<html><body>"]
    for _ in range(rng.randrange(0, 4)):
        r = rng.random()
        if r < 0.2:
            chunks.append("<!-- <table><tr><td>decoy</td></tr></table> -->")
        elif r < 0.35:
            chunks.append("<p>between</p>")
        else:
            chunks.append(_table(rng))
    chunks.append("</body></html>")
    return "".join(chunks)


def _model_tables(html: str):
    clean = re.sub(r"(?s)<!--.*?-->", "", html)
    out = []
    for ti, tbl in enumerate(
        re.findall(r"(?s)<table(?:\s[^>]*)?>(.*?)</table>", clean)
    ):
        for ri, row in enumerate(
            re.findall(r"(?s)<tr(?:\s[^>]*)?>(.*?)</tr>", tbl)
        ):
            is_header = bool(re.search(r"<th[ >]", row))
            for ci, cell in enumerate(
                re.findall(r"(?s)<t[dh](?:\s[^>]*)?>(.*?)</t[dh]>", row)
            ):
                txt = re.sub(r"(?s)<[^>]+>", "", cell).strip(" ")
                out.append((ti, ri, ci, is_header, txt))
    return out


def test_fuzz_table_extractor_matches_python_model(spark, rng):
    from cloud_ocr_summarizer_spark.operators.htmltable import (
        extract_tables,
    )

    files = [(i, _table_file(rng)) for i in range(200)]
    rows = (
        extract_tables(
            spark.createDataFrame(files, "file_id long, html string")
        )
        .orderBy("file_id", "table_idx", "row_idx", "col_idx")
        .collect()
    )
    got = {}
    for r in rows:
        got.setdefault(r.file_id, []).append(
            (r.table_idx, r.row_idx, r.col_idx, r.is_header, r.cell_text)
        )
    for i, html in files:
        assert got.get(i, []) == _model_tables(html), f"file {i}: {html!r}"
