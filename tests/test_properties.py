"""Property-based tests (hypothesis) on the pure-Python oracle — the
executable spec must itself be internally consistent.  No Spark here;
engine parity with the oracle is covered by the golden/fuzz tests.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from cloud_ocr_summarizer_spark import oracle

text_st = st.text(
    alphabet=st.sampled_from(list("ab xy\t\n\r.")), min_size=0, max_size=60
)

span_st = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(
            ["TEXT", "TABLE", "PICTURE", "RULER", "BARCODE", "html", "jpg", "weird", "1", "3"]
        ),
        "text": st.one_of(st.none(), text_st),
        "media_ref": st.one_of(st.none(), st.sampled_from(["gs://a/x.png", "gs://b/y.jpg"])),
        "offset": st.integers(min_value=0, max_value=20),
    }
)


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_normalize_idempotent(s):
    once = oracle.normalize_block_text(s)
    assert oracle.normalize_block_text(once) == once


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_normalize_output_shape(s):
    out = oracle.normalize_block_text(s)
    # no leading/trailing whitespace, no double spaces, no tabs/CRs
    assert out == out.strip()
    assert "  " not in out
    assert "\t" not in out and "\r" not in out


@settings(max_examples=200, deadline=None)
@given(st.lists(span_st, max_size=12))
def test_extract_permutation_invariant(spans):
    base = oracle.extract_document(spans)
    assert oracle.extract_document(list(reversed(spans))) == base
    # sorted-by-offset output, media/text routing invariants
    offsets = [t[3] for t in base]
    assert offsets == sorted(offsets)
    for kind, text, media, _ in base:
        if kind in ("PICTURE", "BARCODE"):
            assert text is None
        if kind in ("TEXT", "TABLE"):
            assert media is None


@settings(max_examples=200, deadline=None)
@given(st.lists(span_st, max_size=12), st.floats(min_value=0, max_value=1))
def test_confidence_gate_monotone(spans, thr):
    for s in spans:
        s = dict(s)
    with_conf = [dict(s, confidence=(s["offset"] % 10) / 10.0) for s in spans]
    low = oracle.extract_document(with_conf, min_confidence=0.0)
    high = oracle.extract_document(with_conf, min_confidence=thr)
    # raising the threshold can only remove spans
    assert len(high) <= len(low)
    assert set(high) <= set(low)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(st.none(), text_st), max_size=8))
def test_rollup_contract(texts):
    out = oracle.rollup_text(texts)
    contributing = [t for t in texts if t]
    if len(contributing) > 1:
        assert out == "\n".join(contributing)
    else:
        assert out is None


def test_vocab_coverage_model(spark):
    """vocab_coverage vs a pure-Python model on a corpus where the
    vocabulary cut and ties both matter."""
    from collections import Counter

    from cloud_ocr_summarizer_spark.operators.textstats import vocab_coverage

    texts = {
        1: "a a a b b c rare1",
        2: "b c c d rare2 rare2",
        3: "a d d d e",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id int, text string"
    )
    cnt = Counter(w for t in texts.values() for w in t.split())
    vocab = {
        w for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    }
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_permille)
        for r in vocab_coverage(docs, vocab_size=4).collect()
    }
    for d, t in texts.items():
        ws = t.split()
        oov = sum(1 for w in ws if w not in vocab)
        assert got[d] == (len(ws), oov, oov * 1000 // len(ws)), (d, vocab)


def test_readability_profile_golden(spark):
    """FK integer-milli arithmetic on hand-computed cases."""
    from cloud_ocr_summarizer_spark.operators.textstats import (
        readability_profile,
    )

    rows = [
        # "the cat sat. it ran." -> W=5 S=2 Sy=5:
        # fk = floor(390*5/2) + floor(11800*5/5) - 15590 = 975+11800-15590
        (1, "the cat sat. it ran."),
        # no punctuation: S clamps to 1; "rhythm zz" -> syllables 1+1
        (2, "rhythm zz"),
        (3, ""),
        (4, None),
        # "beautiful" -> eau+i+u = 3 vowel groups (y counts as vowel)
        (5, "beautiful day!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: tuple(r)[1:] for r in readability_profile(df).collect()}
    assert got[1] == (5, 2, 5, 975 + 11800 - 15590)
    assert got[2] == (2, 1, 2, 390 * 2 + 11800 * 2 // 2 - 15590)
    assert got[3] == (0, 1, 0, None)
    assert got[4] == (0, 1, 0, None)
    w, s, sy, fk = got[5]
    assert (w, s) == (2, 1) and sy == 3 + 1  # beautiful=3, day=1 (ay run)
    assert fk == int(390 * 2 / 1) + int(11800 * 4 / 2) - 15590


def test_dedup_intra_doc_first_occurrence_wins(spark):
    from cloud_ocr_summarizer_spark.operators.textstats import dedup_intra_doc

    a8 = " ".join(["a"] * 8)
    b8 = " ".join(["b"] * 8)
    rows = [
        (1, f"{a8} {b8} {a8}"),          # 3 chunks, 3rd repeats 1st
        (2, f"{a8} {a8} {a8} {a8}"),     # 4 chunks -> 1 kept
        (3, "short tail only"),           # single partial chunk
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: tuple(r)[1:] for r in dedup_intra_doc(df).collect()}
    assert got[1] == (f"{a8} {b8}", 3, 1)
    assert got[2] == (a8, 4, 3)
    assert got[3] == ("short tail only", 1, 0)
    assert got[4] == ("", 0, 0) and got[5] == ("", 0, 0)


def test_gopher_quality_rules_golden(spark):
    from cloud_ocr_summarizer_spark.operators.textstats import (
        gopher_quality_rules,
    )

    good = "the quick brown fox and a dog ran off to town in style"
    numeric = " ".join(["12345"] * 8)  # no alpha words -> R3 fails
    longw = " ".join(["supercalifragilisticexpialidocious"] * 8)  # R2 fails
    rows = [(1, good), (2, numeric), (3, longw), (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_stop_hits"], r["passes_gopher"])
        for r in gopher_quality_rules(df, min_words=5).collect()
    }
    assert got[1] == (13, 5, True)  # the, and, a, to, in (no "of")
    assert got[2][2] is False  # alpha rule
    assert got[3][2] is False  # mean word length > 10
    assert got[4] == (0, 0, False) and got[5] == (0, 0, False)
    # word-count band: same good text but min_words above its count
    strict = {
        r["doc_id"]: r["passes_gopher"]
        for r in gopher_quality_rules(df, min_words=20).collect()
    }
    assert strict[1] is False


def test_vocab_coverage_emits_zero_row_for_empty_docs(spark):
    from cloud_ocr_summarizer_spark.operators.textstats import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "the the cat"), (2, ""), (3, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: tuple(r)[1:] for r in vocab_coverage(docs).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2] == (0, 0, 0) and got[3] == (0, 0, 0)
    assert got[1][0] == 3
