"""Text-stats operators not covered by the fuzz/golden suites."""


def test_top_terms_split_is_exact_and_deterministic(spark):
    from cloud_ocr_summarizer_spark.operators.textstats import (
        top_terms_per_doc,
    )

    docs = spark.createDataFrame(
        [
            (0, "the the the rare0 shared"),
            (1, "the shared shared rare1"),
            (2, "the rare2"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    # all-hot, all-cold, and mixed split must produce identical values
    outs = [
        sorted(
            map(
                tuple,
                top_terms_per_doc(docs, k=3, common_cap=cap).collect(),
            )
        )
        for cap in (0, 2, 100)
    ]
    assert outs[0] == outs[1] == outs[2]
    rows = {
        (r[0], r[1]): r[2:]
        for r in outs[0]
    }
    # doc 0: 'rare0' df=1 tf=1 -> 1e6; 'the' df=3 tf=3 -> 1e6; tie -> 'rare0' first
    assert rows[(0, 1)][0] == "rare0" and rows[(0, 1)][3] == 1_000_000
    assert rows[(0, 2)][0] == "the" and rows[(0, 2)][3] == 1_000_000
    # doc 1: 'shared' tf=2 df=2 -> 1e6, 'rare1' 1e6, 'the' tf=1 df=3 -> 333333
    assert rows[(1, 3)] == ("the", 1, 3, 333_333)
    # NULL-text doc yields no rows
    assert not [kv for kv in rows if kv[0] == 3]


def test_top_terms_hot_path_is_broadcast(spark):
    from cloud_ocr_summarizer_spark.operators.textstats import (
        top_terms_per_doc,
    )

    docs = spark.createDataFrame(
        [(i, "common word%d" % i) for i in range(8)],
        "doc_id long, text string",
    )
    plan = top_terms_per_doc(docs, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
