"""C4-style line-level cleaning (Raffel et al. 2020, §2.2 heuristics).

The C4 corpus cleaned Common Crawl with LINE-granular rules before any
document-level gate: keep only lines that end in terminal punctuation
and carry enough words, drop lines holding boilerplate blockwords
("javascript", "privacy policy", ...) or code braces, and discard any
page containing "lorem ipsum" outright.  The repo's existing gates
(gopher_quality_rules, repetition, compression) are document-granular;
this module adds the line-granular half, which is what actually strips
cookie banners and nav fragments out of otherwise-good pages.

Reference tie-in: the reference emits per-block text
(vision_processor.py:241-288); line cleaning is the curation stage the
north rule adds downstream of extraction, same tier as the Gopher
rules in textstats.py.

Scale design:
  - Entirely row-local: split -> per-line classify -> filter ->
    re-join, all inside one projection (zero shuffles, zero Python).
    The per-line word count is computed once per line inside the
    classifying lambda — no quadratic HOF re-evaluation (the
    ``let_col`` lesson: the lambda never re-splits the document).
  - Every dropped line is COUNTED under the first failing rule in a
    pinned order (blockword > brace > no_terminal > few_words), so the
    corpus-level audit explains exactly where text mass went — the
    drop-audit policy shared with the dedup caps.
  - Document verdicts (lorem-ipsum page drop, minimum kept lines) are
    flags, not filters: downstream picks, nothing vanishes silently.

Synthesis (datagen convention — line content is doc_id arithmetic, so
the DuckDB twin derives each line's verdict in CLOSED FORM from its
kind residue and never runs the classifier):
  n_lines = 3 + doc_id % 4; line i has kind k = (doc_id + i) % 6 —
  k=0 kept, k=1 few-words, k=2 "javascript" blockword, k=3 code brace,
  k=4 missing terminal punctuation, k=5 "privacy policy" blockword;
  docs with doc_id % 13 == 0 append a "Lorem ipsum ..." line
  (blockword line + page-level drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column

# C4's blocklist (lowercased substring match), pinned order
C4_BLOCKWORDS = (
    "lorem ipsum",
    "javascript",
    "privacy policy",
    "cookie policy",
    "terms of use",
)
C4_MIN_WORDS = 5
_TERMINAL_RE = "[.!?][\"']?$"


def _line_reason(line: Column, min_words: int) -> Column:
    """First failing rule for a line, NULL when the line is kept.

    Pinned order: blockword > brace > no_terminal > few_words.  The
    word count is a per-line split (O(line) inside the per-line
    lambda — the document is never re-tokenized).
    """
    low = F.lower(line)
    blocked = F.lit(False)
    for w in C4_BLOCKWORDS:
        blocked = blocked | low.contains(w)
    n_words = F.when(F.length(F.trim(line)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(line), r"\s+"))
    )
    return (
        F.when(blocked, F.lit("blockword"))
        .when(line.contains("{") | line.contains("}"), F.lit("brace"))
        .when(~line.rlike(_TERMINAL_RE), F.lit("no_terminal"))
        .when(n_words < min_words, F.lit("few_words"))
    )


def c4_line_filter(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_words: int = C4_MIN_WORDS,
    min_kept_lines: int = 1,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document line cleaning with per-rule drop counts.

    Output: (doc_id, clean_text, n_lines, n_kept, n_blockword, n_brace,
    n_no_terminal, n_few_words, doc_kept).  ``doc_kept`` is false when
    the page contains "lorem ipsum" anywhere (C4's page-level rule) or
    keeps fewer than ``min_kept_lines`` lines; it is a FLAG — dropped
    docs stay in the output for the audit.
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")
    reasons = F.transform(lines, lambda ln: _line_reason(ln, min_words))

    def n_reason(tag: str) -> Column:
        return F.size(F.filter(reasons, lambda r: r == tag)).cast("int")

    kept = F.filter(
        F.zip_with(lines, reasons, lambda ln, r: F.when(r.isNull(), ln)),
        lambda ln: ln.isNotNull(),
    )
    n_kept = F.size(kept).cast("int")
    has_lorem = F.lower(text).contains("lorem ipsum")
    return docs.select(
        "doc_id",
        *[F.col(c) for c in keep],
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).cast("int").alias("n_lines"),
        n_kept.alias("n_kept"),
        n_reason("blockword").alias("n_blockword"),
        n_reason("brace").alias("n_brace"),
        n_reason("no_terminal").alias("n_no_terminal"),
        n_reason("few_words").alias("n_few_words"),
        (~has_lorem & (n_kept >= min_kept_lines)).alias("doc_kept"),
    )


def c4_line_audit(filtered: DataFrame) -> DataFrame:
    """Corpus rollup of the line-cleaning mass balance (one row).

    Sums per-rule drop counts plus kept/dropped document totals — the
    single row a pipeline owner reads to see where text went.
    """
    return filtered.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("doc_kept"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_docs_kept"),
        F.sum("n_lines").cast("bigint").alias("lines_in"),
        F.sum("n_kept").cast("bigint").alias("lines_kept"),
        F.sum("n_blockword").cast("bigint").alias("lines_blockword"),
        F.sum("n_brace").cast("bigint").alias("lines_brace"),
        F.sum("n_no_terminal").cast("bigint").alias("lines_no_terminal"),
        F.sum("n_few_words").cast("bigint").alias("lines_few_words"),
    )


def derive_noisy_lines_from_documents(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, text) multi-line pages hitting every rule.

    Map-only.  See module docstring for the kind residues; every line
    is re-derivable from (doc_id, i) arithmetic so the DuckDB twin
    never parses the page.
    """
    d = F.col("doc_id")
    n_lines = (d % 4 + 3).cast("int")
    idx = F.sequence(F.lit(0), n_lines - 1)

    def line(i: Column) -> Column:
        k = (d + i) % 6
        tag = F.concat(d.cast("string"), F.lit("-"), i.cast("string"))
        return (
            F.when(
                k == 0,
                F.concat(
                    F.lit("Sentence "), tag, F.lit(" keeps enough clean words here.")
                ),
            )
            .when(k == 1, F.concat(F.lit("short "), tag, F.lit(" line.")))
            .when(
                k == 2,
                F.concat(
                    F.lit("Please enable javascript to view page "), tag, F.lit(".")
                ),
            )
            .when(k == 3, F.concat(F.lit("var x"), tag, F.lit(" = { y: 1 };")))
            .when(
                k == 4,
                F.concat(F.lit("line "), tag, F.lit(" has no terminal punctuation at all")),
            )
            .otherwise(
                F.concat(F.lit("Read our privacy policy for details "), tag, F.lit("."))
            )
        )

    body = F.array_join(F.transform(idx, line), "\n")
    lorem = F.concat(
        F.lit("Lorem ipsum dolor sit amet sample "), d.cast("string"), F.lit(".")
    )
    text = F.when(d % 13 == 0, F.concat(body, F.lit("\n"), lorem)).otherwise(body)
    return docs.select("doc_id", text.alias("text"))
