"""Distributed bag-of-words document classifier (integer arithmetic).

Web-scale curation pipelines gate documents with a cheap supervised
classifier (CCNet/fastText language & quality models): train on a
labeled slice, score the whole corpus.  This module implements the
linear bag-of-words family Spark-first:

* **train** = pure counting — one exploded-token aggregate per
  (token, label) plus label totals.  The weight table is
  vocabulary×labels-sized (bounded by the vocabulary, not the corpus),
  exactly like the bigram-LM count tables (operators/lm.py).
* **score** = explode tokens once, broadcast-join the weight table,
  one (doc, label) aggregate, argmax via ``max_by`` — a single
  corpus-sized shuffle; scoring cost is flat per token at any corpus
  size.

Weights are integer token frequencies per label,
``w(token,label) = (count(token,label) * 10^6) div total_tokens(label)``,
and a document's score for a label is the sum of ``w`` over its token
OCCURRENCES (multiplicity counts) plus an integer prior
``(docs(label) * 10^6) div docs``.  This is the additive-frequency
member of the linear BoW family — NOT log-space naive Bayes: logs are
transcendental and would make the cross-engine value check float-fragile,
so the engine keeps the established integer policy (see the bp quality
scores and micro-unit PageRank).  The prediction is the argmax with
ties broken by label ascending, making every output cell exact in both
engines.

Train/score split is the leakage-safe hash family
(functions/hashing.md5_hash31_col with its own salt), so membership is
a pure function of doc_id — reproducible across runs, partitionings,
and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from cloud_ocr_summarizer_spark.functions.hashing import md5_hash31_col
from cloud_ocr_summarizer_spark.functions.text import whitespace_tokens_col

SCALE = 1_000_000
SPLIT_SALT = "bowtrain"
TRAIN_PCT = 80
# A heavy-tailed web corpus's whitespace vocabulary (URLs, typos, numbers)
# is effectively unbounded, and the weight table is BROADCAST into the
# scoring join — so the vocabulary is capped at the top_v most frequent
# training tokens (ties broken by token ascending, so the set is exact in
# both engines).  OOV tokens simply miss the scoring join and fall back
# to prior-only contribution — the behavior vocab-missing docs always had.
BOW_TOP_V = 16384
VOCAB_SHARDS = 16  # level-1 fanout of the two-level top-V selection


def _with_split(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    h = md5_hash31_col(
        F.concat(F.lit(SPLIT_SALT + ":"), F.col(id_col).cast("string"))
    )
    return docs.withColumn("_is_train", (h % 100) < F.lit(TRAIN_PCT))


def _token_occurrences(docs: DataFrame, *, text_col: str, label_col: str) -> DataFrame:
    """One row per token OCCURRENCE: (doc_id, label, token).

    The label is null-coalesced ("xx"): a NULL label would crash the
    scoring map build (map_from_entries rejects null keys) and
    tie-break differently across engines (Spark struct min is
    nulls-first, SQL ORDER BY ASC is nulls-last).  Keep in lockstep
    with the bow_classify oracle's coalesce.
    """
    return docs.select(
        "doc_id",
        F.coalesce(F.col(label_col), F.lit("xx")).alias("label"),
        F.explode(whitespace_tokens_col(F.lower(F.col(text_col)))).alias("token"),
    )


def _token_totals(occ: DataFrame) -> DataFrame:
    """(token, _c) training-occurrence totals — shared by the top-V
    selection and its drop audit so the two cannot diverge."""
    return occ.groupBy("token").agg(F.count("*").alias("_c"))


def _top_v_vocab(
    occ: DataFrame, *, top_v: int, n_shards: int = VOCAB_SHARDS
) -> DataFrame:
    """The top_v most frequent training tokens (count desc, token asc).

    Two-level selection so no stage ranks the full heavy-tailed
    vocabulary in one task: level 1 keeps each hash shard's top_v
    (window over a shard-sized partition), level 2 ranks the
    <= n_shards * top_v survivors globally — a bounded single-partition
    window by construction (any global top-v token is in its shard's
    top-v: pigeonhole, same argument as sketch.kmv_distinct).
    """
    tot = _token_totals(occ)
    shard_w = Window.partitionBy("_shard").orderBy(
        F.col("_c").desc(), F.col("token").asc()
    )
    pruned = (
        tot.withColumn("_shard", F.pmod(F.xxhash64("token"), F.lit(n_shards)))
        .withColumn("_rn", F.row_number().over(shard_w))
        .where(F.col("_rn") <= top_v)
    )
    final_w = Window.orderBy(F.col("_c").desc(), F.col("token").asc())
    return (
        pruned.select("token", "_c")
        .withColumn("_rn", F.row_number().over(final_w))
        .where(F.col("_rn") <= top_v)
        .select("token")
    )


def train_bow_weights(
    train: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    top_v: int = BOW_TOP_V,
) -> tuple[DataFrame, DataFrame]:
    """-> (weights(token,label,w), priors(label,prior)); both bounded.

    ``w = (count(token,label) * 10^6) div total_tokens(label)``;
    ``prior = (docs(label) * 10^6) div docs`` — all BIGINT.  The weight
    table is restricted to the ``top_v`` most frequent training tokens
    (deterministic ties) so the scoring broadcast is bounded at
    top_v × labels rows no matter how heavy-tailed the corpus
    vocabulary is; kept tokens' weights are EXACTLY what the uncapped
    table would hold (the per-label denominator counts all training
    occurrences), and dropped tokens are observable via
    :func:`bow_vocab_drop_audit`.

    Overflow bound: ``count * 10^6`` holds in BIGINT while a label's
    token count stays under ~9.2·10^12; past that, train on a
    hash-sampled slice (operators/sampling.hash_sample) — which is how
    production curation classifiers are trained anyway (the full-corpus
    pass is the SCORING side, which is per-doc bounded).
    """
    occ = _token_occurrences(train, text_col=text_col, label_col=label_col)
    totals = occ.groupBy("label").agg(F.count("*").alias("_tot"))
    vocab = _top_v_vocab(occ, top_v=top_v)
    weights = (
        occ.join(F.broadcast(vocab), "token", "left_semi")
        .groupBy("token", "label")
        .agg(F.count("*").alias("_cnt"))
        .join(F.broadcast(totals), "label")
        .select("token", "label", F.expr(f"(_cnt * {SCALE}) div _tot").alias("w"))
    )
    label_counts = train.groupBy(
        F.coalesce(F.col(label_col), F.lit("xx")).alias("label")
    ).agg(F.count("*").alias("_n"))
    priors = (
        label_counts.crossJoin(
            F.broadcast(label_counts.agg(F.sum("_n").alias("_tot_docs")))
        )
        .select("label", F.expr(f"(_n * {SCALE}) div _tot_docs").alias("prior"))
    )
    return weights, priors


def score_bow(
    score_docs: DataFrame,
    weights: DataFrame,
    priors: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """-> (doc_id, label, predicted, score, correct) for every input doc.

    Plan shape: tokens explode once and broadcast-join the vocab-sized
    weight table; per-(doc, label) sums collapse to ONE row per doc as
    a label->score map; the labels-sized prior table rides in as a
    single broadcast array row; the argmax is then a row-local fold
    over that array — the corpus never multiplies by the label count
    and never joins on anything but its own doc_id (1:1).  Docs whose
    tokens all miss the vocabulary still score every label's prior.
    Argmax = array_min over (negated score, label) structs — ties to
    the lexicographically smaller label, exact in both engines.
    """
    occ = _token_occurrences(score_docs, text_col=text_col, label_col=label_col)
    score_map = (
        occ.join(F.broadcast(weights.withColumnRenamed("label", "_wl")), "token")
        .groupBy("doc_id", "_wl")
        .agg(F.sum("w").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_wl"), F.col("s")))
            ).alias("_sm")
        )
    )
    prior_arr = priors.agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("label").alias("l"), F.col("prior").alias("p"))
            )
        ).alias("_pa")
    )
    scored = (
        score_docs.select(
            "doc_id",
            F.coalesce(F.col(label_col), F.lit("xx")).alias("label"),
        )
        .join(score_map, "doc_id", "left")
        .crossJoin(F.broadcast(prior_arr))
    )
    best = F.array_min(
        F.transform(
            F.col("_pa"),
            lambda e: F.struct(
                (
                    -(
                        e["p"]
                        + F.coalesce(
                            F.try_element_at(F.col("_sm"), e["l"]), F.lit(0)
                        )
                    )
                ).alias("ns"),
                e["l"].alias("l"),
            ),
        )
    )
    return scored.select(
        "doc_id",
        "label",
        best["l"].alias("predicted"),
        (-best["ns"]).alias("score"),
        (best["l"] == F.col("label")).alias("correct"),
    )


def bow_vocab_drop_audit(
    docs: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    top_v: int = BOW_TOP_V,
) -> DataFrame:
    """ONE row: how much the top-V vocabulary cap of
    :func:`train_bow_weights` drops from the TRAINING slice —
    (cap_name, cap_value, dropped_groups = distinct tokens cut,
    dropped_rows = training occurrences they carried).  Reuses the
    exact occurrence stream and totals stage the trainer ranks, and
    reports explicit zeros when the vocabulary fits (the dedup
    cap-audit policy)."""
    split = _with_split(docs)
    occ = _token_occurrences(
        split.where("_is_train"), text_col=text_col, label_col=label_col
    )
    tot = _token_totals(occ)
    from cloud_ocr_summarizer_spark.operators.audit import cap_drop_audit_row

    dropped = tot.join(
        F.broadcast(_top_v_vocab(occ, top_v=top_v)), "token", "left_anti"
    )
    return cap_drop_audit_row(
        dropped,
        cap_name="bow_vocab_top_v",
        cap_value=top_v,
        dropped_rows=F.col("_c"),
    )


def classify_bow(
    docs: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    top_v: int = BOW_TOP_V,
) -> DataFrame:
    """The composed job: hash-split, train on the 80% slice, score the
    held-out 20% -> (doc_id, label, predicted, score, correct).

    Training tables are bounded aggregates (top-V vocabulary × labels)
    computed once and broadcast into the scoring join; the held-out
    docs never feed the weights, so the accuracy column is honest
    generalization.  Held-out tokens outside the vocabulary miss the
    scoring join and contribute nothing — every label still scores its
    prior.
    """
    split = _with_split(docs)
    weights, priors = train_bow_weights(
        split.where("_is_train"),
        text_col=text_col,
        label_col=label_col,
        top_v=top_v,
    )
    heldout = split.where(~F.col("_is_train")).drop("_is_train")
    return score_bow(
        heldout, weights, priors, text_col=text_col, label_col=label_col
    )
