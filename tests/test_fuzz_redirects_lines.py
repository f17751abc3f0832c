"""Seeded-random fuzz: redirect resolver + C4 line rules vs Python models.

Redirects: random FUNCTIONAL GRAPHS (each src has exactly one outgoing
edge into a small url universe) exercise every reachable shape — long
chains, rho-shaped tails into cycles, self-loops, dangling terminals,
truncation at max_hops — against a pure-Python resolver implementing
the documented semantics (visited-path loop detection counts the
closing edge; truncation only when an edge remains after max_hops).

C4 lines: random pages built from rule-atom fragments against a
pure-Python classifier with the same pinned first-failing-rule order.
"""

import random
import re

import pytest


@pytest.fixture(scope="module")
def rng():
    return random.Random(1234)


# --------------------------------------------------------------- redirects


def _model_resolve(edges: dict, seeds, max_hops: int):
    out = {}
    for s in seeds:
        cur, hops, visited, status = s, 0, {s}, None
        for _ in range(max_hops):
            nxt = edges.get(cur)
            if nxt is None:
                status = "ok"
                break
            hops += 1
            if nxt in visited:
                cur, status = nxt, "loop"
                break
            visited.add(nxt)
            cur = nxt
        if status is None:
            status = "truncated" if edges.get(cur) is not None else "ok"
        out[s] = (cur, hops, status)
    return out


def test_fuzz_resolver_matches_python_model_on_functional_graphs(spark, rng):
    from cloud_ocr_summarizer_spark.operators.redirects import resolve_redirects

    for trial in range(8):
        n = rng.randrange(6, 40)
        urls = [f"u{i}" for i in range(n)]
        # each of a random subset of urls gets exactly one outgoing edge
        srcs = [u for u in urls if rng.random() < 0.7]
        edges = {s: rng.choice(urls) for s in srcs}
        max_hops = rng.choice([1, 2, 4, 7])
        df = spark.createDataFrame(
            [(s, 301, d) for s, d in edges.items()],
            "src_url string, http_status int, dst_url string",
        )
        got = {
            r.url: (r.final_url, r.n_hops, r.status)
            for r in resolve_redirects(df, max_hops=max_hops).collect()
        }
        want = _model_resolve(edges, sorted(edges), max_hops)
        assert got == want, (trial, max_hops, edges)


# --------------------------------------------------------------- C4 lines

_ATOMS = [
    "A perfectly fine sentence with many words here.",
    "Is this kept as a question?",
    'He said "stop!"',
    "short one.",
    "no terminal punctuation in this line at all",
    "please enable JavaScript to continue reading this.",
    "see our Privacy Policy and cookie policy today.",
    "if (x) { return y; } else it drops.",
    "Terms of Use apply to everything written here.",
    "",
    "   ",
    "word",
    "Lorem ipsum dolor sit amet consectetur.",
]

_BLOCK = ("lorem ipsum", "javascript", "privacy policy", "cookie policy", "terms of use")


def _model_reason(line: str, min_words: int):
    low = line.lower()
    if any(w in low for w in _BLOCK):
        return "blockword"
    if "{" in line or "}" in line:
        return "brace"
    if not re.search(r"[.!?][\"']?$", line):
        return "no_terminal"
    t = line.strip()
    n = 0 if not t else len(re.split(r"\s+", t))
    if n < min_words:
        return "few_words"
    return None


def _model_page(text: str, min_words: int, min_kept: int):
    lines = text.split("\n")
    reasons = [_model_reason(ln, min_words) for ln in lines]
    kept = [ln for ln, r in zip(lines, reasons) if r is None]
    counts = {
        k: sum(1 for r in reasons if r == k)
        for k in ("blockword", "brace", "no_terminal", "few_words")
    }
    doc_kept = ("lorem ipsum" not in text.lower()) and len(kept) >= min_kept
    return (
        "\n".join(kept),
        len(lines),
        len(kept),
        counts["blockword"],
        counts["brace"],
        counts["no_terminal"],
        counts["few_words"],
        doc_kept,
    )


def test_fuzz_c4_rules_match_python_model(spark, rng):
    from cloud_ocr_summarizer_spark.operators.linesclean import c4_line_filter

    pages = [
        (i, "\n".join(rng.choice(_ATOMS) for _ in range(rng.randrange(1, 9))))
        for i in range(200)
    ]
    min_words, min_kept = 5, 1
    rows = c4_line_filter(
        spark.createDataFrame(pages, "doc_id long, text string"),
        min_words=min_words,
        min_kept_lines=min_kept,
    ).collect()
    got = {
        r.doc_id: (
            r.clean_text, r.n_lines, r.n_kept, r.n_blockword, r.n_brace,
            r.n_no_terminal, r.n_few_words, r.doc_kept,
        )
        for r in rows
    }
    for i, text in pages:
        assert got[i] == _model_page(text, min_words, min_kept), (i, text)
