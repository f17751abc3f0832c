"""Bag-of-words classifier: hand-computed weights/scores + split hygiene."""

from pyspark.sql import functions as F

from cloud_ocr_summarizer_spark.operators.bow import (
    SCALE,
    classify_bow,
    score_bow,
    train_bow_weights,
)


def test_weights_and_priors_hand_computed(spark):
    train = spark.createDataFrame(
        [
            (1, "cat cat dog", "a"),
            (2, "cat", "a"),
            (3, "dog dog", "b"),
        ],
        "doc_id long, text string, lang string",
    )
    weights, priors = train_bow_weights(train)
    w = {(r.token, r.label): r.w for r in weights.collect()}
    # label a: 4 tokens (cat x3, dog x1); label b: 2 tokens (dog x2)
    assert w[("cat", "a")] == 3 * SCALE // 4
    assert w[("dog", "a")] == 1 * SCALE // 4
    assert w[("dog", "b")] == SCALE
    assert ("cat", "b") not in w
    p = {r.label: r.prior for r in priors.collect()}
    assert p == {"a": 2 * SCALE // 3, "b": 1 * SCALE // 3}


def test_score_argmax_and_tiebreak(spark):
    train = spark.createDataFrame(
        [(1, "x", "a"), (2, "x", "b")],
        "doc_id long, text string, lang string",
    )
    weights, priors = train_bow_weights(train)
    # both labels have identical weights and priors -> tie everywhere;
    # tie must break to the lexicographically smaller label 'a'
    heldout = spark.createDataFrame(
        [(9, "x x", "b")], "doc_id long, text string, lang string"
    )
    out = score_bow(heldout, weights, priors).collect()[0]
    assert out.predicted == "a"
    assert out.correct is False
    # score = prior + 2 * w(x): w = SCALE (1 token of 1), prior = SCALE//2
    assert out.score == SCALE // 2 + 2 * SCALE


def test_classify_bow_scores_only_heldout(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} filler", ["en", "de"][i % 2]) for i in range(200)],
        "doc_id long, text string, lang string",
    )
    out = classify_bow(docs)
    n = out.count()
    assert 0 < n < 200  # the 80/20 hash split really held docs out
    assert out.select("doc_id").distinct().count() == n
    # unseen-vocab docs still get a prediction (prior-only path)
    cols = set(out.columns)
    assert cols == {"doc_id", "label", "predicted", "score", "correct"}


def test_vocab_cap_drops_rare_tokens_and_keeps_weights_exact(spark):
    train = spark.createDataFrame(
        [
            (1, "cat cat cat dog dog rare1", "a"),
            (2, "cat dog rare2", "b"),
        ],
        "doc_id long, text string, lang string",
    )
    full_w, _ = train_bow_weights(train, top_v=1000)
    capped_w, _ = train_bow_weights(train, top_v=2)
    full = {(r.token, r.label): r.w for r in full_w.collect()}
    capped = {(r.token, r.label): r.w for r in capped_w.collect()}
    # top-2 by (count desc, token asc): cat(4), dog(3); rare1/rare2 cut
    assert {t for t, _ in capped} == {"cat", "dog"}
    # kept tokens' weights are EXACTLY the uncapped values (denominator
    # counts all training occurrences, cap only removes rows)
    for key, val in capped.items():
        assert full[key] == val


def test_vocab_cap_tiebreak_is_token_ascending(spark):
    train = spark.createDataFrame(
        [(1, "bb aa cc", "a")], "doc_id long, text string, lang string"
    )
    w, _ = train_bow_weights(train, top_v=2)
    # all counts tie at 1 -> keep the lexicographically smallest tokens
    assert {r.token for r in w.collect()} == {"aa", "bb"}


def test_vocab_selection_shard_invariant(spark):
    from cloud_ocr_summarizer_spark.operators.bow import (
        _token_occurrences,
        _top_v_vocab,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i % 7} t{i % 5} shared", "a") for i in range(40)],
        "doc_id long, text string, lang string",
    )
    occ = _token_occurrences(docs, text_col="text", label_col="lang")
    a = {r.token for r in _top_v_vocab(occ, top_v=4, n_shards=1).collect()}
    b = {r.token for r in _top_v_vocab(occ, top_v=4, n_shards=8).collect()}
    assert a == b  # two-level selection == direct global top-V


def test_oov_doc_scores_prior_only(spark):
    docs = []
    # ids chosen so the hash split puts some in each slice; unseen-token
    # doc text guarantees every token misses the capped vocabulary
    for i in range(30):
        docs.append((i, "common common filler", "a" if i % 2 else "b"))
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = classify_bow(df, top_v=1)
    # with top_v=1 only one token survives; every doc still gets a
    # prediction and score >= the winning label's prior (never null)
    rows = out.collect()
    assert rows and all(r.predicted in ("a", "b") for r in rows)
    assert all(r.score is not None and r.score > 0 for r in rows)


def test_bow_vocab_drop_audit_counts(spark):
    from cloud_ocr_summarizer_spark.operators.bow import bow_vocab_drop_audit

    df = spark.createDataFrame(
        [(i, "cat cat dog unique%d" % i, "a") for i in range(20)],
        "doc_id long, text string, lang string",
    )
    row = bow_vocab_drop_audit(df, top_v=2).collect()[0]
    assert (row.cap_name, row.cap_value) == ("bow_vocab_top_v", 2)
    assert row.dropped_groups > 0 and row.dropped_rows >= row.dropped_groups
    zero = bow_vocab_drop_audit(df, top_v=10_000).collect()[0]
    assert (zero.dropped_groups, zero.dropped_rows) == (0, 0)
