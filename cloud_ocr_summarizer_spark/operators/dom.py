"""HTML DOM tokenization and boilerplate strip (Readability-style).

The north-star pipeline names "batched DOM/byte-stream tokenization and
boilerplate classification ... over a parsed node tree".  The reference
never parses markup itself — it ships page images to a vision API
(/root/reference/src/processors/vision_processor.py) — so this module is
the from-scratch Spark-native realization of that stage for HTML
payloads: tokenize the byte stream into tags and text, decide for every
text node whether it sits inside a boilerplate container (head, nav,
header, footer, aside, script, style), and reassemble the surviving
text in document order.

Two physical strategies, golden-equal on non-nested containers
(the repo's simple/detailed duality):

* ``extract_html_main_simple`` — pure JVM column expressions: comment
  strip, one non-greedy regexp_replace per container type, tag strip,
  whitespace normalize.  WholeStageCodegen end to end, zero Python.
  LIMITATION (documented, tested): a container nested inside the same
  container type ends at the FIRST closing tag — the regex cannot
  count.  Real-world nav-inside-nav is rare; when it matters, use the
  canonical path.
* ``extract_html_main`` — Arrow-batched ``mapInPandas``.  The "parsed
  node tree" is represented in vectorized form: ``str.extractall``
  tokenizes every document in the batch at once, and per-container
  OPEN/CLOSE balance counters (grouped cumulative sums) decide
  containment — exactly a stack machine's depth counter, computed
  column-wise with zero per-row Python (the repo's Arrow-UDF rule; the
  only per-GROUP pandas call is the final ordered join per doc).
  Handles arbitrarily nested containers correctly.

Scale shape: both are one shuffle-free map stage over whatever
partitioning the input already has — the same plan class as the
flagship extractor; a 1000-executor scan parallelizes embarrassingly.

Input HTML contract (matches datagen.derive_html_from_documents and any
tag-soup within it): tags ``<name ...>``/``</name>``, attribute values
without ``>``, comments ``<!-- -->``; entity decoding is out of scope.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from cloud_ocr_summarizer_spark.functions.text import whitespace_tokens_col

# containers whose entire subtree is boilerplate (Readability's
# unlikelyCandidates, reduced to the structural tags)
BOILER_CONTAINERS = ("head", "nav", "header", "footer", "aside", "script", "style")

_TOKEN_RE = r"(?s)<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*>|([^<]+)"
_COMMENT_RE = r"(?s)<!--.*?-->"

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("main_text", T.StringType()),
        T.StructField("n_tokens", T.IntegerType()),
    ]
)


def _strip_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reset_index(drop=True)  # positional alignment for reindex below
    html = pdf["html"].fillna("").str.replace(_COMMENT_RE, " ", regex=True)
    toks = html.str.extractall(_TOKEN_RE)
    if toks.empty:
        out = pd.DataFrame({"doc_id": pdf["doc_id"]})
        out["main_text"] = ""
        out["n_tokens"] = 0
        return out.astype({"n_tokens": "int32"})
    doc_pos = toks.index.get_level_values(0)
    # an empty capture (the '/' group on an OPEN tag) surfaces as NaN, not ''
    slash, tag, text = toks[0].fillna(""), toks[1].str.lower(), toks[2]
    inside_boiler = pd.Series(False, index=toks.index)
    for name in BOILER_CONTAINERS:
        opens = ((tag == name) & (slash == "")).astype("int64")
        closes = ((tag == name) & (slash == "/")).astype("int64")
        # depth counter: >0 at a token means an unclosed <name> precedes
        # it — the vectorized form of the parse stack's containment test
        balance = (opens - closes).groupby(doc_pos).cumsum()
        inside_boiler |= balance > 0
    kept = text[text.notna() & ~inside_boiler]
    joined = kept.groupby(kept.index.get_level_values(0)).agg(" ".join)
    main = (
        joined.str.split().str.join(" ")
        .reindex(range(len(pdf)), fill_value="")
        .reset_index(drop=True)
    )
    out = pd.DataFrame({"doc_id": pdf["doc_id"], "main_text": main})
    out["n_tokens"] = main.str.split().str.len().fillna(0).astype("int32")
    return out


def extract_html_main(
    df: DataFrame, *, html_col: str = "html", carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, html) -> (doc_id, main_text, n_tokens), canonical path.

    ``carry`` passes extra input columns through the Arrow stage
    unchanged (output rows are 1:1 positional with input rows), so a
    fused pipeline can keep row-local results alongside the strip
    without a doc_id re-join.
    """
    src = df.select(
        F.col("doc_id").cast("long"),
        F.col(html_col).alias("html"),
        *[F.col(c) for c in carry],
    )
    schema = T.StructType(list(_OUT_SCHEMA.fields) + [src.schema[c] for c in carry])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                out = _strip_batch(pdf)
                for c in carry:
                    out[c] = pdf[c].reset_index(drop=True)
                yield out

    return src.mapInPandas(run, schema=schema)


def extract_html_main_simple(
    df: DataFrame, *, html_col: str = "html", keep: tuple[str, ...] = ()
) -> DataFrame:
    """JVM-regex twin: same output on non-nested boilerplate containers.
    ``keep`` carries extra input columns through (projection, no join —
    the datagen convention)."""
    x: Column = F.regexp_replace(F.coalesce(F.col(html_col), F.lit("")), _COMMENT_RE, " ")
    for name in BOILER_CONTAINERS:
        x = F.regexp_replace(x, rf"(?is)<{name}\b[^>]*>.*?</{name}\s*>", " ")
    stripped = F.regexp_replace(x, r"(?s)<[^>]*>", " ")
    words = whitespace_tokens_col(stripped)
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_join(words, " ").alias("main_text"),
        F.size(words).cast("int").alias("n_tokens"),
        *[F.col(c) for c in keep],
    )


_DENSE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("main_text", T.StringType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_dropped", T.IntegerType()),
    ]
)


# ---- shared per-<p>-block classification kernel -----------------------
# All block classifiers (link density, text density, and the combined
# Readability rule) run the SAME tokenize/containment/count machinery;
# only the drop rule differs — a predicate over the per-block counts
# (wc = tokens, lwc = anchor-contained tokens, tc = non-whitespace
# chars).  Rules cannot diverge from the stage they filter.


def _rule_link_dense(pb: pd.DataFrame) -> pd.Series:
    """Readability link density, integer form: drop iff 2*link > total."""
    return 2 * pb["lwc"] > pb["wc"]


def _rule_text_sparse(pb: pd.DataFrame) -> pd.Series:
    """Boilerpipe text density: drop iff fewer than TD_MIN_WPL words per
    80-column wrapped line of the single-space-normalized text."""
    nc = pb["tc"] + (pb["wc"] - 1).clip(lower=0)
    lines = ((nc + TD_WRAP_COLS - 1) // TD_WRAP_COLS).clip(lower=1)
    return pb["wc"] < TD_MIN_WPL * lines


def _rule_readability(pb: pd.DataFrame) -> pd.Series:
    """The full Readability pair: a block survives only if it is neither
    link-dense nor text-sparse."""
    return _rule_link_dense(pb) | _rule_text_sparse(pb)


def _classify_blocks_batch(pdf: pd.DataFrame, drop_rule) -> pd.DataFrame:
    empty = lambda: pd.DataFrame(  # noqa: E731
        {
            "doc_id": pdf["doc_id"],
            "main_text": "",
            "n_tokens": 0,
            "n_blocks": 0,
            "n_dropped": 0,
        }
    ).astype({"n_tokens": "int32", "n_blocks": "int32", "n_dropped": "int32"})
    pdf = pdf.reset_index(drop=True)
    html = pdf["html"].fillna("").str.replace(_COMMENT_RE, " ", regex=True)
    toks = html.str.extractall(_TOKEN_RE)
    if toks.empty:
        return empty()
    doc_pos = toks.index.get_level_values(0)
    slash, tag, text = toks[0].fillna(""), toks[1].str.lower(), toks[2]

    inside_boiler = pd.Series(False, index=toks.index)
    for name in BOILER_CONTAINERS:
        opens = ((tag == name) & (slash == "")).astype("int64")
        closes = ((tag == name) & (slash == "/")).astype("int64")
        inside_boiler |= (opens - closes).groupby(doc_pos).cumsum() > 0

    # block machinery: depth counter for <p> containment (matching the
    # JVM twin's "<p>...</p> contents only" contract) + a running block
    # id from the cumulative open count
    p_open = (tag == "p") & (slash == "") & ~inside_boiler
    p_close = (tag == "p") & (slash == "/") & ~inside_boiler
    p_bal = (p_open.astype("int64") - p_close.astype("int64")).groupby(doc_pos).cumsum()
    block_id = p_open.astype("int64").groupby(doc_pos).cumsum()
    a_open = ((tag == "a") & (slash == "")).astype("int64")
    a_close = ((tag == "a") & (slash == "/")).astype("int64")
    a_bal = (a_open - a_close).groupby(doc_pos).cumsum()

    is_text = text.notna() & ~inside_boiler & (p_bal > 0)
    wc = text.str.split().str.len().where(is_text, 0).astype("int64")
    link_wc = wc.where(a_bal > 0, 0)
    # sum of token lengths == non-whitespace chars; vectorized
    tchars = (
        text.str.replace(r"\s+", "", regex=True).str.len().where(is_text, 0)
        .astype("int64")
    )

    key = pd.DataFrame(
        {"doc": doc_pos, "blk": block_id, "wc": wc, "lwc": link_wc, "tc": tchars}
    )
    per_block = key[block_id > 0].groupby(["doc", "blk"], sort=False).agg(
        wc=("wc", "sum"), lwc=("lwc", "sum"), tc=("tc", "sum")
    )
    # a block exists per <p> open
    dropped = per_block[drop_rule(per_block)].index
    n_blocks = (
        p_open.groupby(doc_pos).sum().reindex(range(len(pdf)), fill_value=0)
    )
    n_dropped = (
        pd.Series(1, index=dropped).groupby(level=0).sum()
        .reindex(range(len(pdf)), fill_value=0)
        if len(dropped)
        else pd.Series(0, index=range(len(pdf)))
    )

    drop_mask = pd.MultiIndex.from_arrays([doc_pos, block_id]).isin(dropped)
    kept_text = text[is_text & ~pd.Series(drop_mask, index=toks.index)]
    joined = kept_text.groupby(kept_text.index.get_level_values(0)).agg(" ".join)
    main = (
        joined.str.split().str.join(" ")
        .reindex(range(len(pdf)), fill_value="")
        .reset_index(drop=True)
    )
    out = pd.DataFrame({"doc_id": pdf["doc_id"], "main_text": main})
    out["n_tokens"] = main.str.split().str.len().fillna(0).astype("int32")
    out["n_blocks"] = n_blocks.reset_index(drop=True).astype("int32")
    out["n_dropped"] = n_dropped.reset_index(drop=True).astype("int32")
    return out


def extract_html_dense(df: DataFrame, *, html_col: str = "html") -> DataFrame:
    """Readability-style link-density block classification, canonical
    Arrow path: tokenize -> strip boilerplate containers -> segment into
    <p> blocks -> count tokens and anchor-contained tokens per block via
    the same vectorized depth counters -> DROP blocks where
    2*link_tokens > tokens (nav/related-link lists) -> reassemble the
    survivors in document order.

    Output: (doc_id, main_text, n_tokens, n_blocks, n_dropped).  The
    integer 2x rule keeps the decision exact in every engine (no float
    density), mirroring the repo's integer-cents convention.
    """
    src = df.select(F.col("doc_id").cast("long"), F.col(html_col).alias("html"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _classify_blocks_batch(pdf, _rule_link_dense)

    return src.mapInPandas(run, schema=_DENSE_SCHEMA)


def extract_html_dense_simple(df: DataFrame, *, html_col: str = "html") -> DataFrame:
    """JVM-expression twin of :func:`extract_html_dense` (same non-nested
    container limitation as ``extract_html_main_simple``): block bodies
    via regexp_extract_all, per-block token / anchor-token counts and the
    2x density rule inside HOF lambdas — WholeStageCodegen, zero Python."""
    x: Column = F.regexp_replace(F.coalesce(F.col(html_col), F.lit("")), _COMMENT_RE, " ")
    for name in BOILER_CONTAINERS:
        x = F.regexp_replace(x, rf"(?is)<{name}\b[^>]*>.*?</{name}\s*>", " ")
    blocks = F.regexp_extract_all(x, F.lit(r"(?is)<p\b[^>]*>(.*?)</p\s*>"), 1)

    def tokens(c: Column) -> Column:
        return whitespace_tokens_col(F.regexp_replace(c, r"(?s)<[^>]*>", " "))

    def link_tokens(c: Column) -> Column:
        return F.size(
            tokens(
                F.array_join(
                    F.regexp_extract_all(
                        c, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), 1
                    ),
                    " ",
                )
            )
        )

    kept = F.filter(blocks, lambda b: 2 * link_tokens(b) <= F.size(tokens(b)))
    # empty kept blocks would inject stray separators into the join; the
    # canonical path whitespace-normalizes them away, so drop them here
    nonempty = F.filter(kept, lambda b: F.size(tokens(b)) > 0)
    main = F.array_join(
        F.transform(nonempty, lambda b: F.array_join(tokens(b), " ")), " "
    )
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        main.alias("main_text"),
        F.size(whitespace_tokens_col(main)).cast("int").alias("n_tokens"),
        F.size(blocks).cast("int").alias("n_blocks"),
        (F.size(blocks) - F.size(kept)).cast("int").alias("n_dropped"),
    )


# ---- text-density block classification (Kohlschütter et al., WSDM'10:
# "Boilerplate Detection using Shallow Text Features" — text density =
# words per wrapped line at a fixed column width; low-density blocks
# are boilerplate).  Integer form so the decision is exact in every
# engine: with wc = whitespace tokens and nc = single-space-normalized
# character count, lines = max(1, ceil(nc/80)) and a block is DROPPED
# iff wc < 7 * lines.  Empty blocks (wc = 0) fall out of the same rule.
TD_WRAP_COLS = 80
TD_MIN_WPL = 7


def extract_html_density(df: DataFrame, *, html_col: str = "html") -> DataFrame:
    """Boilerpipe-style TEXT-density block classification, canonical
    Arrow path (the second Readability heuristic the north star names,
    complementing :func:`extract_html_dense`'s LINK density): tokenize
    -> strip boilerplate containers -> segment into <p> blocks -> per
    block count tokens (wc) and normalized chars (nc, tokens joined by
    single spaces) via the same vectorized depth counters -> DROP
    blocks with fewer than ``TD_MIN_WPL`` words per 80-column wrapped
    line (integer rule ``wc < 7 * max(1, ceil(nc/80))`` — short
    bylines, copyright lines, captions) -> reassemble survivors in
    document order.

    Output: (doc_id, main_text, n_tokens, n_blocks, n_dropped)."""
    src = df.select(F.col("doc_id").cast("long"), F.col(html_col).alias("html"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _classify_blocks_batch(pdf, _rule_text_sparse)

    return src.mapInPandas(run, schema=_DENSE_SCHEMA)


def extract_html_density_simple(df: DataFrame, *, html_col: str = "html") -> DataFrame:
    """JVM-expression twin of :func:`extract_html_density` (same
    non-nested container limitation as the other ``_simple`` paths):
    blocks via regexp_extract_all, the words-per-wrapped-line rule
    inside HOF lambdas — WholeStageCodegen, zero Python.  The integer
    ceil is floor((nc+79)/80): exact for any realistic block size."""
    x: Column = F.regexp_replace(F.coalesce(F.col(html_col), F.lit("")), _COMMENT_RE, " ")
    for name in BOILER_CONTAINERS:
        x = F.regexp_replace(x, rf"(?is)<{name}\b[^>]*>.*?</{name}\s*>", " ")
    blocks = F.regexp_extract_all(x, F.lit(r"(?is)<p\b[^>]*>(.*?)</p\s*>"), 1)

    def tokens(c: Column) -> Column:
        return whitespace_tokens_col(F.regexp_replace(c, r"(?s)<[^>]*>", " "))

    def is_kept(b: Column) -> Column:
        w = tokens(b)
        wc = F.size(w)
        nc = F.length(F.array_join(w, " "))
        lines = F.greatest(
            F.floor((nc + F.lit(TD_WRAP_COLS - 1)) / F.lit(TD_WRAP_COLS)).cast("int"),
            F.lit(1),
        )
        return wc >= F.lit(TD_MIN_WPL) * lines

    kept = F.filter(blocks, is_kept)
    main = F.array_join(F.transform(kept, lambda b: F.array_join(tokens(b), " ")), " ")
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        main.alias("main_text"),
        F.size(whitespace_tokens_col(main)).cast("int").alias("n_tokens"),
        F.size(blocks).cast("int").alias("n_blocks"),
        (F.size(blocks) - F.size(kept)).cast("int").alias("n_dropped"),
    )


def extract_html_classified(
    df: DataFrame, *, html_col: str = "html", carry: tuple[str, ...] = ()
) -> DataFrame:
    """The COMBINED Readability classifier, canonical Arrow path: a
    <p> block survives only if it is neither link-dense
    (``2*link_tokens > tokens``) nor text-sparse
    (``wc < 7 * max(1, ceil(nc/80))``) — the north star's full
    "text-density + link-density heuristics" applied in ONE pass over
    the shared block kernel (same tokenize/containment/count stage as
    the single-rule classifiers; only the predicate differs).

    ``carry`` passes extra input columns through the Arrow stage
    unchanged (output rows are 1:1 positional with input rows), same
    contract as ``extract_html_main(carry=...)`` — a fused pipeline
    keeps row-local results alongside the classification without a
    doc_id re-join.

    Output: (doc_id, main_text, n_tokens, n_blocks, n_dropped)."""
    src = df.select(
        F.col("doc_id").cast("long"),
        F.col(html_col).alias("html"),
        *[F.col(c) for c in carry],
    )
    schema = T.StructType(list(_DENSE_SCHEMA.fields) + [src.schema[c] for c in carry])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                out = _classify_blocks_batch(pdf, _rule_readability)
                for c in carry:
                    out[c] = pdf[c].reset_index(drop=True)
                yield out

    return src.mapInPandas(run, schema=schema)


def extract_html_classified_simple(
    df: DataFrame, *, html_col: str = "html"
) -> DataFrame:
    """JVM-expression twin of :func:`extract_html_classified` (same
    non-nested container limitation as the other ``_simple`` paths):
    both integer rules inside one HOF filter — WholeStageCodegen."""
    x: Column = F.regexp_replace(F.coalesce(F.col(html_col), F.lit("")), _COMMENT_RE, " ")
    for name in BOILER_CONTAINERS:
        x = F.regexp_replace(x, rf"(?is)<{name}\b[^>]*>.*?</{name}\s*>", " ")
    blocks = F.regexp_extract_all(x, F.lit(r"(?is)<p\b[^>]*>(.*?)</p\s*>"), 1)

    def tokens(c: Column) -> Column:
        return whitespace_tokens_col(F.regexp_replace(c, r"(?s)<[^>]*>", " "))

    def is_kept(b: Column) -> Column:
        w = tokens(b)
        wc = F.size(w)
        link_wc = F.size(
            tokens(
                F.array_join(
                    F.regexp_extract_all(
                        b, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), 1
                    ),
                    " ",
                )
            )
        )
        nc = F.length(F.array_join(w, " "))
        lines = F.greatest(
            F.floor((nc + F.lit(TD_WRAP_COLS - 1)) / F.lit(TD_WRAP_COLS)).cast("int"),
            F.lit(1),
        )
        return (2 * link_wc <= wc) & (wc >= F.lit(TD_MIN_WPL) * lines)

    kept = F.filter(blocks, is_kept)
    main = F.array_join(F.transform(kept, lambda b: F.array_join(tokens(b), " ")), " ")
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        main.alias("main_text"),
        F.size(whitespace_tokens_col(main)).cast("int").alias("n_tokens"),
        F.size(blocks).cast("int").alias("n_blocks"),
        (F.size(blocks) - F.size(kept)).cast("int").alias("n_dropped"),
    )


__all__ = [
    "extract_html_main",
    "extract_html_main_simple",
    "extract_html_dense",
    "extract_html_dense_simple",
    "extract_html_density",
    "extract_html_density_simple",
    "extract_html_classified",
    "extract_html_classified_simple",
    "BOILER_CONTAINERS",
    "TD_WRAP_COLS",
    "TD_MIN_WPL",
]


# ---- robots meta gate (crawl-compliance filter) --------------------------

ROBOTS_NOINDEX_RE = r'(?i)<meta[^>]*name="robots"[^>]*content="[^"]*noindex'


def inject_robots_noindex(
    html_df: DataFrame, *, html_col: str = "html", every: int = 13
) -> DataFrame:
    """Deterministically mark every ``every``-th document noindex (a
    <meta name="robots" content="noindex"> in <head>) — the synthesis
    side of the compliance-gate round trip."""
    flagged = F.pmod(F.col("doc_id"), F.lit(every)) == 0
    injected = F.regexp_replace(
        F.col(html_col),
        "<head>",
        '<head><meta name="robots" content="noindex">',
    )
    return html_df.withColumn(
        html_col, F.when(flagged, injected).otherwise(F.col(html_col))
    )


def meta_robots_gate(html_df: DataFrame, *, html_col: str = "html") -> DataFrame:
    """Drop documents whose HTML declares robots noindex — the standard
    crawl-compliance gate, applied BEFORE extraction spends any work on
    the body.  Row-local rlike filter; zero shuffles."""
    return html_df.where(~F.col(html_col).rlike(ROBOTS_NOINDEX_RE))
