"""BPE merge learning: Spark trainer == pure-Python reference trainer
(counts, tie-breaks, greedy merge application), plus encoder round-trip
properties."""

from collections import Counter

import pytest
from pyspark.sql import functions as F


def py_bpe_merges(word_freqs: dict[str, int], n_merges: int, min_pair_count: int = 2):
    """Reference BPE trainer: greedy left-to-right merge application,
    ties broken (count DESC, left ASC, right ASC)."""
    vocab = [(list(w), f) for w, f in word_freqs.items()]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), c = best
        if c < min_pair_count:
            break
        merges.append(
            {"rank": rank, "left": l, "right": r, "merged": l + r, "pair_count": c}
        )
        new_vocab = []
        for syms, f in vocab:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((out, f))
        vocab = new_vocab
    return merges


def test_bpe_matches_python_reference_on_toy_corpus(spark):
    from cloud_ocr_summarizer_spark.operators.bpe import train_bpe_merges

    text = (
        "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest"
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = train_bpe_merges(docs, n_merges=8)
    want = py_bpe_merges(Counter(text.split()), 8)
    assert got == want
    # the classic Sennrich outcome: 'est' and 'low' become single units
    merged = {m["merged"] for m in got}
    assert "est" in merged and "low" in merged


def test_bpe_fuzz_vs_python(spark):
    """Seeded random corpora (repeats, single chars, unicode, ties):
    full merge list identical to the reference trainer."""
    import random

    from cloud_ocr_summarizer_spark.operators.bpe import train_bpe_merges

    rng = random.Random(11)
    vocab = ["ab", "abc", "a", "bcbc", "ccc", "döner", "x", "yz", "zzz"]
    for trial in range(3):
        words = rng.choices(vocab, k=rng.randrange(20, 60))
        text = " ".join(words)
        docs = spark.createDataFrame(
            [(i, " ".join(words[i::4])) for i in range(4)],
            "doc_id long, text string",
        )
        got = train_bpe_merges(docs, n_merges=5)
        want = py_bpe_merges(Counter(text.split()), 5)
        assert got == want, (trial, text)


def test_bpe_early_stop_and_degenerate_inputs(spark):
    from cloud_ocr_summarizer_spark.operators.bpe import train_bpe_merges

    # all single-char words -> no pairs -> zero merges
    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, ""), (3, None)], "doc_id long, text string"
    )
    assert train_bpe_merges(docs, n_merges=4) == []
    # every pair unique (count 1) -> min_pair_count=2 stops immediately
    docs2 = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    assert train_bpe_merges(docs2, n_merges=4) == []
    assert train_bpe_merges(docs2, n_merges=4, min_pair_count=1) != []


def test_bpe_encoder_applies_learned_merges(spark):
    from cloud_ocr_summarizer_spark.operators.bpe import (
        bpe_encode_col,
        train_bpe_merges,
    )

    text = "banana banana banana band bandana"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = train_bpe_merges(docs, n_merges=4, min_pair_count=1)
    toks = docs.select(
        bpe_encode_col(F.col("text"), merges).alias("t")
    ).collect()[0]["t"]
    # concatenating tokens reconstructs the lowercased text without spaces
    assert "".join(toks) == text.replace(" ", "")
    # merges genuinely compressed: fewer tokens than characters
    assert len(toks) < len(text.replace(" ", ""))
    # no token contains the separator
    assert all("\x1f" not in t for t in toks)


def test_bpe_merge_never_matches_across_symbol_boundaries(spark):
    """Regression for the string-replace implementation bug: symbols
    [ab, c] under merge (b, c) must NOT fuse (the pair (b, c) does not
    occur), and consecutive runs must merge greedily left-to-right.
    Corpus chosen so round 1 learns (a,b) and round 2 learns (b,c):
    'abc' is then [ab, c] and must survive as two symbols."""
    from collections import Counter

    from cloud_ocr_summarizer_spark.operators.bpe import (
        apply_merge_col,
        train_bpe_merges,
    )
    from pyspark.sql import functions as F

    text = " ".join(["ab"] * 5 + ["abc"] * 2 + ["xbc"] * 4)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = train_bpe_merges(docs, n_merges=6)
    want = py_bpe_merges(Counter(text.split()), 6)
    assert got == want

    # direct fold semantics: boundary non-match + consecutive-run greed
    df = spark.createDataFrame([(["ab", "c"],), (["a"] * 5,)], "syms array<string>")
    out = df.select(apply_merge_col(F.col("syms"), "b", "c").alias("o")).collect()
    assert out[0]["o"] == ["ab", "c"]
    out2 = df.select(apply_merge_col(F.col("syms"), "a", "a").alias("o")).collect()
    assert out2[1]["o"] == ["aa", "aa", "a"]
