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
