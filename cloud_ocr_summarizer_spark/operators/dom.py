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


def extract_html_main(df: DataFrame, *, html_col: str = "html") -> DataFrame:
    """(doc_id, html) -> (doc_id, main_text, n_tokens), canonical path."""
    src = df.select(F.col("doc_id").cast("long"), F.col(html_col).alias("html"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _strip_batch(pdf)

    return src.mapInPandas(run, schema=_OUT_SCHEMA)


def extract_html_main_simple(df: DataFrame, *, html_col: str = "html") -> DataFrame:
    """JVM-regex twin: same output on non-nested boilerplate containers."""
    x: Column = F.regexp_replace(F.coalesce(F.col(html_col), F.lit("")), _COMMENT_RE, " ")
    for name in BOILER_CONTAINERS:
        x = F.regexp_replace(x, rf"(?is)<{name}\b[^>]*>.*?</{name}\s*>", " ")
    stripped = F.regexp_replace(x, r"(?s)<[^>]*>", " ")
    words = whitespace_tokens_col(stripped)
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_join(words, " ").alias("main_text"),
        F.size(words).cast("int").alias("n_tokens"),
    )


__all__ = ["extract_html_main", "extract_html_main_simple", "BOILER_CONTAINERS"]
