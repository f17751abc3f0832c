"""Corpus-trained n-gram language-model signals for curation — the
CCNet-style "perplexity filter" family (Wenzek et al. 2020, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data"),
trained on the corpus itself rather than an external model (no model
files exist in this environment; the operator family is the same).

Two surfaces, split by what can cross the engine boundary exactly:

* ``lm_rarity_profile`` — INTEGER per-doc features from the corpus
  bigram/unigram count tables (n_bigrams, rare-bigram share in basis
  points, summed corpus counts).  Fully DuckDB-value-checkable; the
  rare-bigram share is itself a standard quality proxy (documents made
  of corpus-unique word transitions are boilerplate mashups, OCR noise,
  or spam).
* ``bigram_perplexity`` — the true add-one-smoothed bigram perplexity
  per document.  Involves log()/exp(), whose ulp behavior is
  engine-specific, so it is pinned against a pure-Python model in
  pytest instead of DuckDB (the HLL-estimate pattern).

Scale shape: the count tables are ONE corpus-sized aggregation each
(map-side partial, keyed by word / word-pair — vocabulary-sized
outputs, not corpus-sized); scoring is one explode + one equi-join
keyed by bigram + one per-doc aggregation.  No pairwise work, no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cloud_ocr_summarizer_spark.functions.text import let_col, whitespace_tokens_col

RARE_COUNT_MAX = 1  # a bigram seen once corpus-wide is "rare"


def _doc_bigrams(docs: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent lowercase token pair within a
    document (document boundaries are sequence boundaries; no sentinel
    tokens)."""
    # token array let-bound: element_at inside the lambda must index the
    # BOUND array, not the split expression (re-tokenize per pair = O(n^2))
    def pairs_of(words: Column) -> Column:
        return F.when(
            F.size(words) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - 2),
                lambda i: F.struct(
                    F.element_at(words, i.cast("int") + 1).alias("w1"),
                    F.element_at(words, i.cast("int") + 2).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    pairs = let_col(whitespace_tokens_col(F.lower(F.col(text_col))), pairs_of)
    return docs.select(F.col(id_col), F.explode(pairs).alias("_p")).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )


def bigram_count_tables(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(unigrams, bigrams) corpus count tables: (w1, c1) counts each
    word's occurrences as a bigram LEFT context (the add-one
    conditional's denominator base), (w1, w2, c2) counts pairs.  Both
    are vocabulary-sized and returned PERSISTED — the scoring operators
    reference each multiple times (per-branch recomputation would
    re-explode the corpus pair stream); they stay cached for the
    session like curate_documents_full's core (tiny, documented
    tradeoff)."""
    bi = _doc_bigrams(docs, id_col=id_col, text_col=text_col)
    bigrams = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c2")
    ).persist()
    unigrams = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1")).persist()
    return unigrams, bigrams


def lm_rarity_profile(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document integer LM features against the corpus-trained
    bigram table:

      n_bigrams        adjacent-pair count (0 for docs under 2 tokens)
      rare_bigram_bp   floor(10000 * pairs whose corpus count <=
                       RARE_COUNT_MAX / n_bigrams) — high = the doc is
                       made of transitions nothing else in the corpus
                       uses (mashup/noise/spam signal)
      sum_pair_count   total corpus support of the doc's pairs (BIGINT)

    Every document surfaces (left join), including empty ones with
    zeros.  Integer end to end — DuckDB-value-checkable."""
    _, bigrams = bigram_count_tables(docs, id_col=id_col, text_col=text_col)
    doc_bi = _doc_bigrams(docs, id_col=id_col, text_col=text_col)
    scored = doc_bi.join(bigrams, ["w1", "w2"])  # every pair exists
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.when(F.col("c2") <= RARE_COUNT_MAX, 1).otherwise(0)).alias(
            "_n_rare"
        ),
        F.sum("c2").alias("sum_pair_count"),
    )
    base = docs.select(F.col(id_col))
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("int").alias("n_bigrams"),
        F.coalesce(
            F.when(
                F.col("n_bigrams") > 0,
                F.floor(F.lit(10000.0) * F.col("_n_rare") / F.col("n_bigrams")),
            ),
            F.lit(0),
        )
        .cast("int")
        .alias("rare_bigram_bp"),
        F.coalesce(F.col("sum_pair_count"), F.lit(0))
        .cast("bigint")
        .alias("sum_pair_count"),
    )


def bigram_perplexity(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Add-one-smoothed bigram perplexity per document against the
    corpus-trained tables:

      logprob = sum over pairs of ln((c2 + 1) / (c1 + V))
      ppl     = exp(-logprob / n_bigrams)

    V = distinct left-context vocabulary size (computed lazily: a 1-row
    aggregate cross-joined in, never an eager driver job).  Float
    output — pinned against a pure-Python model in pytest, NOT DuckDB
    (log/exp ulp behavior is engine-specific).  Every document
    surfaces; docs with no bigrams report NULL perplexity (same
    every-doc contract as ``lm_rarity_profile``)."""
    unigrams, bigrams = bigram_count_tables(docs, id_col=id_col, text_col=text_col)
    vocab = unigrams.agg(F.count(F.lit(1)).alias("_v"))
    doc_bi = _doc_bigrams(docs, id_col=id_col, text_col=text_col)
    scored = (
        doc_bi.join(bigrams, ["w1", "w2"])
        .join(unigrams, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.log((F.col("c2") + 1) / (F.col("c1") + F.col("_v"))).alias("_lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.exp(-F.sum("_lp") / F.count(F.lit(1))).alias("perplexity"),
    )
    base = docs.select(F.col(id_col))
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("int").alias("n_bigrams"),
        F.col("perplexity"),
    )
