"""End-to-end corpus curation: dedup -> gates -> leakage-safe split."""

import pyspark.sql.functions as F

from cloud_ocr_summarizer_spark.plans.curate import curate_documents

SF_DIR = "/root/testdata/sf0.001"


def test_curate_documents_end_to_end(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    curated = curate_documents(docs, min_quality=2000, parallelism=8).cache()

    n_in = docs.count()
    n_out = curated.count()
    assert 0 < n_out < n_in

    # curated ids are a subset of input ids, no duplicates
    assert curated.select("doc_id").distinct().count() == n_out
    assert curated.join(docs, "doc_id", "left_anti").count() == 0

    # no exact-duplicate normalized text survives
    from cloud_ocr_summarizer_spark.functions.text import normalize_block_text_col

    dups = (
        curated.select(normalize_block_text_col(F.col("text")).alias("t"))
        .groupBy("t")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dups == 0

    # splits partition the output and roughly follow 80/10/10
    splits = {
        r["split"]: r["count"] for r in curated.groupBy("split").count().collect()
    }
    assert set(splits) <= {"train", "val", "test"}
    assert sum(splits.values()) == n_out
    assert splits["train"] > splits.get("val", 0)
    assert splits["train"] > splits.get("test", 0)


def test_curate_language_gate(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    curated = curate_documents(docs, min_quality=0, lang="en", parallelism=8)
    # every surviving doc must classify as en
    from cloud_ocr_summarizer_spark.operators.textstats import language_id_scores

    joined = curated.join(
        language_id_scores(docs).select("doc_id", "pred_lang"), "doc_id"
    )
    assert joined.filter("pred_lang <> 'en'").count() == 0


def test_curate_drops_repetitive_docs(spark):
    from cloud_ocr_summarizer_spark.operators.textstats import repetition_profile

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    degenerate = spark.createDataFrame(
        [(999999, "spam " * 50, "en", "srcX", 250)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs = base.unionByName(degenerate)
    curated = curate_documents(docs, min_quality=0, parallelism=8)
    assert curated.filter("doc_id = 999999").count() == 0  # flagged -> dropped
    # sanity: the flag actually fires for that doc
    assert (
        repetition_profile(degenerate).filter("flagged").count() == 1
    )


def test_curate_documents_full_composition(spark):
    """Full pipeline: core curation + decontamination + PII redaction +
    mixing + packing compose without losing invariants."""
    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.plans.curate import (
        curate_documents,
        curate_documents_full,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.pmod(F.col("doc_id"), F.lit(25)) == 0).select(
        "doc_id", "text"
    )
    core_ids = {
        r["doc_id"] for r in curate_documents(docs).select("doc_id").collect()
    }
    out = curate_documents_full(
        docs,
        benchmark=bench,
        contamination_n=3,
        mix_fractions={f"src{i}": 1.0 for i in range(20)},
        pack_budget=128,
    )
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    # decontamination only ever REMOVES docs from the core set
    assert ids <= core_ids
    # benchmark members that survived core curation are contaminated
    # with themselves (n=3 grams) -> dropped
    bench_ids = {r["doc_id"] for r in bench.collect()}
    assert not (ids & bench_ids & core_ids) or all(
        i not in ids for i in (bench_ids & core_ids)
    )
    # schema contract + packing columns present and consistent
    assert set(out.columns) == {
        "doc_id", "source", "split", "text", "n_tokens",
        "bucket", "bin_id", "fill_pos",
    }
    for r in rows:
        assert r["split"] in ("train", "val", "test")
        assert r["fill_pos"] // 128 == r["bin_id"]
        assert "@" not in r["text"]  # PII scrub ran on the kept text


def test_new_operators_handle_empty_inputs(spark):
    """Edge battery: every round-2 operator must return an EMPTY result
    (correct schema), not crash, on empty input."""
    from pyspark.sql import functions as F

    from cloud_ocr_summarizer_spark.operators.dedup import ngram_contamination
    from cloud_ocr_summarizer_spark.operators.sampling import (
        hash_sample,
        pack_sequences,
    )
    from cloud_ocr_summarizer_spark.operators.textstats import (
        redact_pii,
        select_primary_language,
    )

    empty_docs = spark.createDataFrame(
        [], "doc_id int, source string, text string"
    )
    some_docs = spark.createDataFrame(
        [(1, "s0", "hello world")], "doc_id int, source string, text string"
    )

    assert ngram_contamination(empty_docs, some_docs, n=2).count() == 0
    # empty BENCHMARK: nothing can be contaminated
    res = ngram_contamination(some_docs, empty_docs, n=2).collect()
    assert len(res) == 1 and res[0]["contaminated"] is False
    assert redact_pii(empty_docs).count() == 0
    assert hash_sample(empty_docs, fraction=0.5).count() == 0
    assert (
        pack_sequences(
            empty_docs.select("doc_id", F.lit(1).alias("n_tokens"))
        ).count()
        == 0
    )
    langs_empty = spark.createDataFrame(
        [], "doc_id int, languages array<struct<lang:string,conf:double>>"
    )
    assert select_primary_language(langs_empty, default="en").count() == 0


def test_curation_cap_audit_matches_pipeline_position(spark):
    """The audit must account for drops the PIPELINE would take: a mass
    of byte-identical docs is collapsed by exact dedup before the
    near-dup stage, so with after_exact_dedup (the default) it must NOT
    appear as LSH bucket drops — while the raw-operator view does see
    them."""
    from cloud_ocr_summarizer_spark.plans.curate import curation_cap_audit

    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "near the warm fire and the birds sing in the tall green trees"
    )
    rows = [(i, base) for i in range(40)] + [
        (100 + i, f"completely different text number {i} {i} {i} with tail")
        for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    def lsh_row(df):
        return {
            r["cap_name"]: r
            for r in df.collect()
        }["minhash_lsh_bucket"]

    piped = lsh_row(curation_cap_audit(docs, max_bucket_size=8))
    assert piped["dropped_groups"] == 0  # dedup already collapsed the 40
    raw = lsh_row(
        curation_cap_audit(docs, max_bucket_size=8, after_exact_dedup=False)
    )
    assert raw["dropped_groups"] >= 8  # the operator-level view does fire


def test_curate_full_line_clean_stage(spark):
    """line_clean=True is exactly 'C4-clean first, then the pipeline':
    parity with a manual pre-clean, and a lorem-ipsum page never
    reaches dedup."""
    from cloud_ocr_summarizer_spark.operators.linesclean import c4_line_filter
    from cloud_ocr_summarizer_spark.plans.curate import curate_documents_full

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    noisy = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit("\nEnable javascript to view this page.\n"),
            F.when(
                F.col("doc_id") == 3, F.lit("Lorem ipsum dolor sit amet.\n")
            ).otherwise(F.lit("")),
            F.col("text"),
        ),
    )

    auto = curate_documents_full(
        noisy, pack_budget=None, min_quality=0, line_clean=True
    )
    passthrough = tuple(c for c in noisy.columns if c not in ("doc_id", "text"))
    manual_docs = (
        c4_line_filter(noisy, keep=passthrough)
        .where(F.col("doc_kept"))
        .select("doc_id", *passthrough, F.col("clean_text").alias("text"))
    )
    manual = curate_documents_full(manual_docs, pack_budget=None, min_quality=0)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, manual.collect()))
    assert auto.where(F.col("doc_id") == 3).count() == 0
    assert auto.where(F.col("text").contains("javascript")).count() == 0
