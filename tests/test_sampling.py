"""Sampling + sequence-packing semantics: deterministic membership,
stratified rates, packing invariants under any partitioning."""

import hashlib

import pytest
from pyspark.sql import functions as F

from cloud_ocr_summarizer_spark.operators.sampling import (
    hash_sample,
    pack_sequences,
)


def _h31(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16) % 2147483647


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"s{i % 3}", "w " * (5 + i % 40)) for i in range(600)]
    return spark.createDataFrame(rows, "doc_id int, source string, text string")


def test_hash_sample_matches_python_model(spark, docs):
    got = {r["doc_id"] for r in hash_sample(docs, fraction=0.3).collect()}
    want = {
        i for i in range(600) if _h31(f"sample:{i}") % 1_000_000 < 300_000
    }
    assert got == want
    # roughly the requested rate on 600 docs
    assert 0.2 < len(got) / 600 < 0.4


def test_hash_sample_stratified(spark, docs):
    out = hash_sample(
        docs, stratum_col="source", fractions={"s0": 1.0, "s1": 0.5}
    )
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["s0"] == 200          # rate 1.0 keeps everything
    assert 60 <= by_src.get("s1", 0) <= 140  # ~half
    assert "s2" not in by_src           # missing stratum -> dropped


def test_hash_sample_partitioning_invariant(spark, docs):
    a = sorted(r["doc_id"] for r in hash_sample(docs, fraction=0.4).collect())
    b = sorted(
        r["doc_id"]
        for r in hash_sample(docs.repartition(17), fraction=0.4).collect()
    )
    assert a == b


def test_hash_sample_requires_args(spark, docs):
    with pytest.raises(ValueError):
        hash_sample(docs)
    with pytest.raises(ValueError):
        hash_sample(docs, fractions={"s0": 1.0})


def test_pack_sequences_invariants(spark, docs):
    with_tokens = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    budget = 64
    out = pack_sequences(with_tokens, budget=budget, n_buckets=8)
    rows = out.collect()
    assert len(rows) == 600  # every doc packed exactly once

    # per (bucket, bin): fill positions are the running sum in hash order,
    # and a bin only overflows by its LAST doc (contiguous fill)
    by_bin = {}
    for r in rows:
        by_bin.setdefault((r["bucket"], r["bin_id"]), []).append(r)
    for (_, bin_id), members in by_bin.items():
        members.sort(key=lambda r: r["fill_pos"])
        # the bin a doc starts in is dictated by its fill position
        for m in members:
            assert m["fill_pos"] // budget == bin_id
    # deterministic under repartitioning
    again = {
        (r["doc_id"], r["bucket"], r["bin_id"], r["fill_pos"])
        for r in pack_sequences(
            with_tokens.repartition(13), budget=budget, n_buckets=8
        ).collect()
    }
    assert again == {
        (r["doc_id"], r["bucket"], r["bin_id"], r["fill_pos"]) for r in rows
    }


def test_hash_sample_empty_fractions_raises(spark):
    import pytest as _pytest

    from cloud_ocr_summarizer_spark.operators.sampling import hash_sample

    docs = spark.createDataFrame([(1, "s0")], "doc_id int, source string")
    with _pytest.raises(ValueError, match="at least one stratum"):
        hash_sample(docs, stratum_col="source", fractions={})


def test_chunk_documents_boundaries(spark):
    import pytest as _pytest

    from cloud_ocr_summarizer_spark.operators.sampling import chunk_documents

    def doc(i, n):
        return (i, " ".join(f"w{k}" for k in range(n)))

    # n=10 (< chunk), n=64 (== chunk), n=65 (one past), n=160 (3 chunks)
    docs = spark.createDataFrame(
        [doc(1, 10), doc(2, 64), doc(3, 65), doc(4, 160)],
        "doc_id int, text string",
    )
    rows = chunk_documents(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for v in by_doc.values():
        v.sort(key=lambda r: r.chunk_id)

    assert [len(by_doc[d]) for d in (1, 2, 3, 4)] == [1, 1, 2, 3]
    assert by_doc[1][0].chunk_len == 10
    assert by_doc[2][0].chunk_len == 64
    # 65 tokens: chunk 0 = tokens 0..63, chunk 1 = tokens 48..64 (17)
    assert [r.chunk_len for r in by_doc[3]] == [64, 17]
    assert by_doc[3][1].chunk_text.split() == [f"w{k}" for k in range(48, 65)]
    # 160 tokens: starts 0, 48, 96; last covers through token 159
    assert [r.chunk_len for r in by_doc[4]] == [64, 64, 64]
    assert by_doc[4][2].chunk_text.split()[-1] == "w159"
    # overlap: each chunk's first 16 tokens repeat the previous one's tail
    c0, c1 = by_doc[4][0].chunk_text.split(), by_doc[4][1].chunk_text.split()
    assert c0[-16:] == c1[:16]
    # full coverage of every token for every doc
    for d, n in ((1, 10), (2, 64), (3, 65), (4, 160)):
        seen = set()
        for r in by_doc[d]:
            seen.update(r.chunk_text.split())
        assert seen == {f"w{k}" for k in range(n)}

    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_tokens=32, stride=40)


def test_cap_per_source_deterministic_and_capped(spark):
    from cloud_ocr_summarizer_spark.operators.sampling import cap_per_source

    rows = [(i, f"s{i % 3}") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_source(docs, cap=10)
    got = out.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"s0": 10, "s1": 10, "s2": 10}
    # pure function of the data: identical keep-set across partitionings
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"] for r in cap_per_source(docs.repartition(17), cap=10).collect()
    )
    assert a == b
    # under-cap sources pass through whole
    small = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, source string")
    assert cap_per_source(small, cap=10).count() == 2


def test_chunk_documents_null_text_doc_survives(spark):
    from cloud_ocr_summarizer_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c")], "doc_id long, text string"
    )
    out = chunk_documents(docs, chunk_tokens=2, stride=1)
    by_doc = {r["doc_id"] for r in out.collect()}
    assert by_doc == {1, 2, 3}  # NULL-text doc must not vanish


def test_temperature_mix_rates_and_determinism(spark):
    """Rates follow p_i ~ n_i^alpha quantized to ppm; alpha=1 degenerates
    to a flat target_frac; membership is deterministic and the corpus
    side of the rate join is broadcast."""
    import math

    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.operators.sampling import temperature_mix

    rows = [(i, "a") for i in range(8)] + [(100, "b"), (101, "b")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, alpha=0.3, target_frac=0.5)
    got = {r["doc_id"]: r["rate_ppm"] for r in out.collect()}

    w_a, w_b = math.pow(8, 0.3), math.pow(2, 0.3)
    wsum = w_a + w_b
    exp = {
        "a": min(1_000_000, int((500_000.0 * 10) * w_a / (wsum * 8) + 0.5)),
        "b": min(1_000_000, int((500_000.0 * 10) * w_b / (wsum * 2) + 0.5)),
    }
    rates = {
        r["source"]: r["rate_ppm"]
        for r in out.select("source", "rate_ppm").distinct().collect()
    }
    assert rates == exp  # every stratum must survive with its exact rate
    assert exp["b"] > exp["a"]  # small stratum upsampled
    # alpha=1 -> every stratum keeps at the flat target rate
    flat = temperature_mix(df, alpha=1.0, target_frac=0.5)
    assert {r["rate_ppm"] for r in flat.collect()} == {500_000}
    # deterministic membership, subset of input
    again = {r["doc_id"] for r in temperature_mix(df, alpha=0.3, target_frac=0.5).collect()}
    assert again == set(got)
    assert again <= {r[0] for r in rows}
    # the rate table joins back via broadcast: corpus never shuffles
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # guard rails
    import pytest as _pytest
    with _pytest.raises(ValueError):
        temperature_mix(df, target_frac=0.0)


def test_temperature_mix_null_stratum_is_sampled_not_dropped(spark):
    """A NULL stratum must be rated and sampled like any other (the rate
    join is null-safe) — not silently dropped while inflating the other
    strata's denominators."""
    from cloud_ocr_summarizer_spark.operators.sampling import temperature_mix

    rows = [(i, "a") for i in range(6)] + [(100 + i, None) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, alpha=0.3, target_frac=1.0).collect()
    # target_frac=1.0 with equal-size strata -> rate 1e6, keep everything
    assert {r["doc_id"] for r in out} == {r[0] for r in rows}
    assert all(r["rate_ppm"] == 1_000_000 for r in out)
