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
keyed by bigram + one per-doc aggregation.  The every-doc contract is
carried by an OUTER explode (zero-pair docs keep one NULL pair row
through the aggregate), not by a join back to the input — the old
base-join shape cost a third corpus scan plus a corpus-sized
SortMergeJoin per consumer.  No pairwise work, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cloud_ocr_summarizer_spark.functions.text import let_col, whitespace_tokens_col

RARE_COUNT_MAX = 1  # a bigram seen once corpus-wide is "rare"
# The bigram table's heavy tail IS the count-1 pairs (Zipf: typically
# the majority of distinct pairs).  Pairs below this floor are pruned
# from the stored table — when scoring the SAME corpus the table was
# trained on, a pair missing from the pruned table has exact corpus
# count min_pair_count - 1 = 1 (it exists at least once, via the doc
# being scored), so every downstream value is reconstructed exactly
# and output is bit-identical to the unpruned table (pytest-pinned).
LM_MIN_PAIR_COUNT = 2


def _check_exact_reconstruction(min_pair_count: int) -> None:
    """Raise (not assert — ``python -O`` must not skip this) when the
    prune floor breaks the consumers' exact-reconstruction contract: a
    pair missing from the pruned table has true corpus count in
    [1, min_pair_count - 1], so coalescing to ``min_pair_count - 1`` is
    exact only when that interval is the single value {1}."""
    if min_pair_count > 2:
        raise ValueError(
            f"min_pair_count={min_pair_count} prunes pairs with corpus "
            "counts 1..{} which cannot all be reconstructed as {}; "
            "scoring would be silently wrong — only min_pair_count <= 2 "
            "preserves bit-identical output".format(
                min_pair_count - 1, min_pair_count - 1
            )
        )


def _doc_bigrams(
    docs: DataFrame, *, id_col: str, text_col: str, outer: bool = False
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent lowercase token pair within a
    document (document boundaries are sequence boundaries; no sentinel
    tokens).  With ``outer=True`` a document with fewer than 2 tokens
    keeps one all-NULL pair row, so per-doc aggregations downstream
    cover EVERY document without a corpus-sized join back to the input
    (the every-doc contract used to cost a SortMergeJoin + one extra
    corpus scan per consumer)."""
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
    exploded = F.explode_outer(pairs) if outer else F.explode(pairs)
    return docs.select(F.col(id_col), exploded.alias("_p")).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )


def bigram_count_tables(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair_count: int = LM_MIN_PAIR_COUNT,
) -> tuple[DataFrame, DataFrame]:
    """(unigrams, bigrams) corpus count tables: (w1, c1) counts each
    word's occurrences as a bigram LEFT context (the add-one
    conditional's denominator base), (w1, w2, c2) counts pairs with
    corpus count >= ``min_pair_count``.  The unigram table is
    vocabulary-sized (one power); the UNPRUNED pair table is up to
    vocabulary² and its heavy tail is the count-1 pairs, so the floor
    bounds the stored/joined table without changing any downstream
    value: scoring the training corpus itself, a missing pair's count
    is exactly ``min_pair_count - 1`` (see the consumers' coalesce).
    Both tables are returned PERSISTED — the scoring operators
    reference each multiple times (per-branch recomputation would
    re-explode the corpus pair stream); they stay cached for the
    session like curate_documents_full's core (tiny, documented
    tradeoff).  Pruned mass is observable via
    :func:`lm_pair_drop_audit`."""
    bi = _doc_bigrams(docs, id_col=id_col, text_col=text_col)
    bigrams = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .where(F.col("c2") >= min_pair_count)
        .persist()
    )
    unigrams = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1")).persist()
    return unigrams, bigrams


def lm_pair_drop_audit(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair_count: int = LM_MIN_PAIR_COUNT,
) -> DataFrame:
    """ONE row: how much the ``min_pair_count`` floor of
    :func:`bigram_count_tables` prunes — (cap_name, cap_value,
    dropped_groups = distinct pairs cut, dropped_rows = corpus
    occurrences they carried).  Rebuilds the exact pre-floor count
    stage, explicit zeros when nothing is pruned (the dedup cap-audit
    policy)."""
    from cloud_ocr_summarizer_spark.operators.audit import cap_drop_audit_row

    bi = _doc_bigrams(docs, id_col=id_col, text_col=text_col)
    counts = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    return cap_drop_audit_row(
        counts.where(F.col("c2") < min_pair_count),
        cap_name="lm_min_pair_count",
        cap_value=min_pair_count,
        dropped_rows=F.col("c2"),
    )


def lm_rarity_profile(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair_count: int = LM_MIN_PAIR_COUNT,
) -> DataFrame:
    """Per-document integer LM features against the corpus-trained
    bigram table:

      n_bigrams        adjacent-pair count (0 for docs under 2 tokens)
      rare_bigram_bp   floor(10000 * pairs whose corpus count <=
                       RARE_COUNT_MAX / n_bigrams) — high = the doc is
                       made of transitions nothing else in the corpus
                       uses (mashup/noise/spam signal)
      sum_pair_count   total corpus support of the doc's pairs (BIGINT)

    Every document surfaces (outer pair stream), including empty ones
    with zeros.  Integer end to end — DuckDB-value-checkable.

    The pair table is pruned at LM_MIN_PAIR_COUNT=2, so a doc pair
    missing from it has exact corpus count 1 (the doc itself carries
    one occurrence) — the left join + coalesce(c2, 1) reconstructs
    every value bit-identically to the unpruned table (pytest-pinned;
    the DuckDB twin computes from the unpruned counts)."""
    _check_exact_reconstruction(min_pair_count)
    _, bigrams = bigram_count_tables(
        docs, id_col=id_col, text_col=text_col, min_pair_count=min_pair_count
    )
    # outer pair stream: a <2-token doc keeps one NULL pair row, so the
    # per-doc aggregate below covers every document and the old
    # base.join(per_doc, "left") — a corpus-sized SortMergeJoin plus a
    # third corpus scan, there only to zero-fill those docs — is gone
    # (values bit-identical; NULL join keys simply never match bigrams)
    doc_bi = _doc_bigrams(docs, id_col=id_col, text_col=text_col, outer=True)
    has_pair = F.col("w1").isNotNull()
    scored = doc_bi.join(bigrams, ["w1", "w2"], "left").withColumn(
        "_c2",
        F.when(has_pair, F.coalesce(F.col("c2"), F.lit(min_pair_count - 1))),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum(F.when(has_pair, 1).otherwise(0)).alias("n_bigrams"),
        F.sum(F.when(F.col("_c2") <= RARE_COUNT_MAX, 1).otherwise(0)).alias(
            "_n_rare"
        ),
        F.sum("_c2").alias("sum_pair_count"),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_bigrams").cast("int").alias("n_bigrams"),
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
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair_count: int = LM_MIN_PAIR_COUNT,
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
    _check_exact_reconstruction(min_pair_count)
    unigrams, bigrams = bigram_count_tables(
        docs, id_col=id_col, text_col=text_col, min_pair_count=min_pair_count
    )
    vocab = unigrams.agg(F.count(F.lit(1)).alias("_v"))
    # outer pair stream + left unigram join: zero-pair docs ride the
    # aggregate as one NULL row instead of being re-joined from a third
    # corpus scan (same SortMergeJoin removal as lm_rarity_profile; the
    # unigram join was inner before, which was equivalent only because
    # every non-NULL w1 is in the table it was trained from)
    doc_bi = _doc_bigrams(docs, id_col=id_col, text_col=text_col, outer=True)
    has_pair = F.col("w1").isNotNull()
    # left join + coalesce(c2, 1): pairs pruned by the min-count floor
    # have exact corpus count 1 on the training corpus (see
    # bigram_count_tables) — values identical to the unpruned table
    scored = (
        doc_bi.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            has_pair.alias("_has"),
            F.when(
                has_pair,
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(min_pair_count - 1)) + 1)
                    / (F.col("c1") + F.col("_v"))
                ),
            ).alias("_lp"),
        )
    )
    n = F.sum(F.when(F.col("_has"), 1).otherwise(0))
    return scored.groupBy(id_col).agg(
        n.cast("int").alias("n_bigrams"),
        # guard INSIDE the aggregate: ANSI division by a zero pair count
        # must never evaluate (zero-pair docs report NULL perplexity)
        F.when(n > 0, F.exp(-F.sum("_lp") / n)).alias("perplexity"),
    )
