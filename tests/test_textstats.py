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


def test_script_profile_counts_and_tie_order(spark):
    from cloud_ocr_summarizer_spark.operators.textstats import (
        script_profile,
    )

    docs = spark.createDataFrame(
        [
            (0, "abc 中中中中 йй 12"),   # cjk wins (4 > 3 latin)
            (1, "abcd 中中中中"),        # tie 4-4 -> latin by fixed order
            (2, "...!!!"),               # nothing countable -> other
            (3, None),                   # NULL text -> other
            (4, "99 7"),                 # digits win
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in script_profile(docs).collect()}
    assert (rows[0].n_latin, rows[0].n_cjk, rows[0].n_cyrillic,
            rows[0].n_digit) == (3, 4, 2, 2)
    assert rows[0].main_script == "cjk"
    assert rows[1].main_script == "latin"
    assert rows[2].main_script == "other"
    assert rows[3].main_script == "other"
    assert rows[4].main_script == "digit"


def test_script_profile_noise_is_arithmetic(spark):
    from cloud_ocr_summarizer_spark.operators.textstats import (
        script_profile,
    )

    docs = spark.createDataFrame(
        [(i, "ab") for i in range(6)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in script_profile(docs, add_noise=True).collect()}
    for i in range(6):
        assert rows[i].n_latin == 2
        assert rows[i].n_cjk == i % 5
        assert rows[i].n_cyrillic == i % 3
        assert rows[i].n_digit == i % 4


def test_compression_profile_matches_local_zlib(spark):
    import zlib

    from cloud_ocr_summarizer_spark.operators.textstats import (
        compression_profile,
    )

    texts = {
        0: "spam " * 400,            # hyper-repetitive -> low ratio, flagged
        1: "the quick brown fox jumps over the lazy dog " * 3,
        2: "",                       # empty -> ratio 0, never flagged
        3: None,                     # NULL behaves as empty
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in compression_profile(docs).collect()}
    for i, t in texts.items():
        raw = (t or "").encode("utf-8")
        assert rows[i].n_bytes == len(raw)
        assert rows[i].n_zlib == len(zlib.compress(raw, 6))
        expect_ratio = (rows[i].n_zlib * 1000) // len(raw) if raw else 0
        assert rows[i].ratio_permille == expect_ratio
    assert rows[0].flagged is True and rows[0].ratio_permille < 300
    assert rows[1].flagged is False
    assert rows[2].flagged is False and rows[2].ratio_permille == 0
    assert rows[3].flagged is False
