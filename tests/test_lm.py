"""Corpus-trained bigram LM signals: rarity features vs a hand model,
perplexity vs a pure-Python add-one-smoothed model."""

import math
from collections import Counter

import pytest


def _py_tables(texts):
    uni, bi = Counter(), Counter()
    for t in texts:
        ws = (t or "").lower().split()
        for a, b in zip(ws, ws[1:]):
            uni[a] += 1
            bi[(a, b)] += 1
    return uni, bi


def test_lm_rarity_hand_computed(spark):
    from cloud_ocr_summarizer_spark.operators.lm import lm_rarity_profile

    rows = [
        (1, "the cat sat on the mat"),  # "the cat"/"cat sat" shared with doc 2
        (2, "the cat sat"),
        (3, "zq xv qp"),                # every transition corpus-unique
        (4, ""),
        (5, None),
        (6, "solo"),                    # 1 token: zero pairs, must zero-fill
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in lm_rarity_profile(df).collect()}
    assert got[1]["n_bigrams"] == 5
    # rare pairs in doc 1: "sat on", "on the", "the mat" (each corpus count 1)
    assert got[1]["rare_bigram_bp"] == 6000
    assert got[2]["rare_bigram_bp"] == 0      # both its pairs occur twice
    assert got[3]["rare_bigram_bp"] == 10000  # gibberish: all unique
    # empty / NULL / single-token docs all surface via the outer pair
    # stream (the every-doc contract that used to need a join-back)
    for i in (4, 5, 6):
        assert got[i] == {
            "doc_id": i, "n_bigrams": 0, "rare_bigram_bp": 0, "sum_pair_count": 0
        }


def test_bigram_perplexity_matches_python_model(spark):
    """Seeded fuzz corpus: Spark perplexity == the pure-Python add-one
    model to float tolerance; gibberish scores strictly higher than
    formulaic text."""
    import random

    from cloud_ocr_summarizer_spark.operators.lm import bigram_perplexity

    rng = random.Random(3)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran"]
    texts = []
    for i in range(40):
        texts.append((i, " ".join(rng.choices(vocab, k=rng.randrange(2, 15)))))
    texts.append((100, "zq xv qp lm"))  # unique transitions
    texts.append((101, ""))             # zero pairs -> NULL perplexity
    texts.append((102, "solo"))         # one token -> NULL perplexity
    df = spark.createDataFrame(texts, "doc_id long, text string")

    uni, bi = _py_tables(t for _, t in texts)
    v = len(uni)

    def py_ppl(t):
        ws = (t or "").lower().split()
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            return None
        lp = sum(math.log((bi[p] + 1) / (uni[p[0]] + v)) for p in pairs)
        return math.exp(-lp / len(pairs))

    got = {r["doc_id"]: r["perplexity"] for r in bigram_perplexity(df).collect()}
    assert set(got) == {i for i, _ in texts}  # every doc surfaces
    for i, t in texts:
        want = py_ppl(t)
        if want is None:
            assert got[i] is None  # no bigrams -> NULL perplexity
        else:
            assert got[i] == pytest.approx(want, rel=1e-9), (i, t)
    # NOTE: under add-one smoothing a rare pair out of a COMMON left
    # context (big c1 denominator) is more surprising than gibberish
    # whose contexts are themselves unseen — so the sound ordering
    # property is only relative to each doc's own contexts:
    # a doc of maximally-frequent transitions sits below the median.
    best_pair = max(bi.items(), key=lambda kv: kv[1])[0]
    smooth = spark.createDataFrame(
        texts + [(200, " ".join([best_pair[0], best_pair[1]] * 4))],
        "doc_id long, text string",
    )
    got2 = {r["doc_id"]: r["perplexity"] for r in bigram_perplexity(smooth).collect()}
    ordered = sorted(v for v in got2.values() if v is not None)
    assert got2[200] <= ordered[len(ordered) // 2]


def test_min_pair_floor_is_bit_identical(spark):
    """The pruned bigram table + coalesce reconstruction gives EXACTLY
    the unpruned outputs on the training corpus (the floor's contract)."""
    from cloud_ocr_summarizer_spark.operators.lm import lm_rarity_profile

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "zq xv qp"),
        (4, ""),
        (5, None),
        (6, "the cat the cat zq xv"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pruned = {r.doc_id: r.asDict() for r in
              lm_rarity_profile(df, min_pair_count=2).collect()}
    full = {r.doc_id: r.asDict() for r in
            lm_rarity_profile(df, min_pair_count=1).collect()}
    assert pruned == full


def test_perplexity_unchanged_by_min_pair_floor(spark):
    from cloud_ocr_summarizer_spark.operators.lm import bigram_perplexity

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y")], "doc_id long, text string"
    )
    a = {r.doc_id: r.perplexity for r in
         bigram_perplexity(df, min_pair_count=2).collect()}
    b = {r.doc_id: r.perplexity for r in
         bigram_perplexity(df, min_pair_count=1).collect()}
    for d in a:
        assert abs(a[d] - b[d]) < 1e-12


def test_lm_pair_drop_audit_counts(spark):
    from cloud_ocr_summarizer_spark.operators.lm import lm_pair_drop_audit

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "q r")], "doc_id long, text string"
    )
    # pairs: (a,b)x2, (b,a)x1, (b,c)x1, (q,r)x1 -> 3 count-1 pairs cut
    row = lm_pair_drop_audit(df, min_pair_count=2).collect()[0]
    assert (row.cap_name, row.cap_value) == ("lm_min_pair_count", 2)
    assert (row.dropped_groups, row.dropped_rows) == (3, 3)


def test_min_pair_count_above_two_refused_in_both_consumers(spark):
    """A prune floor above 2 breaks exact reconstruction (pruned pairs
    with true count 1 vs 2 become indistinguishable) — both consumers
    must refuse loudly, not silently score wrong."""
    import pytest

    from cloud_ocr_summarizer_spark.operators.lm import (
        bigram_perplexity,
        lm_rarity_profile,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="min_pair_count"):
        lm_rarity_profile(docs, min_pair_count=3)
    with pytest.raises(ValueError, match="min_pair_count"):
        bigram_perplexity(docs, min_pair_count=3)
