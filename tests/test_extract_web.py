"""Composed web-extraction pipeline (plans/extract_web.py): the
north-rule job as one call — DOM strip + span extraction + layout parse
joined per document.  The DuckDB oracle (plans/oracles.py
``extract_web``) covers cross-engine values; these tests pin the
composition against its own single-operator branches and the plan shape.
"""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _web(spark):
    from cloud_ocr_summarizer_spark.plans.extract_web import extract_web_documents

    return extract_web_documents(
        spark.read.parquet(f"{SF}/documents.parquet")
    )


def test_one_row_per_document_and_branch_consistency(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    web = _web(spark).cache()
    try:
        assert web.count() == docs.count()

        # DOM branch identical to the standalone query
        from cloud_ocr_summarizer_spark.plans import queries as Q

        dom = Q.q_html_main_content(spark, SF)
        assert (
            web.select("doc_id", "main_text", "n_tokens")
            .exceptAll(dom.select(F.col("doc_id").cast("long"), "main_text", "n_tokens"))
            .count()
            == 0
        )

        # layout branch consistent with the standalone reading-order twin
        ro = (
            Q.q_layout_reading_order_rowlocal(spark, SF)
            .groupBy(F.col("doc_id").cast("long").alias("doc_id"))
            .agg(
                F.count("*").cast("int").alias("n_blocks"),
                F.min(F.when(F.col("reading_seq") == 1, F.col("block_text"))).alias(
                    "first_block"
                ),
            )
        )
        assert (
            web.select("doc_id", "n_blocks", "first_block").exceptAll(ro).count() == 0
        )

        # media tagging: every document interleaves media spans
        row = web.agg(
            F.min("n_media").alias("lo"), F.max("n_spans").alias("hi")
        ).first()
        assert row["lo"] >= 0 and row["hi"] > 0
    finally:
        web.unpersist()


def test_empty_document_survives_both_variants(spark):
    """A document with no words has zero blocks; element_at(…, 1) on the
    empty block array would kill the whole JOB under ANSI mode (found on
    the 1M bench corpus — the sf testdata has no empty docs).  Both
    variants must emit the row with zero counts and a NULL first_block."""
    from cloud_ocr_summarizer_spark.plans.extract_web import (
        extract_web_documents,
        extract_web_documents_fused,
    )

    docs = spark.createDataFrame(
        [(1, "", "s0"), (2, "   ", "s0"), (3, "some real words here", "s1")],
        "doc_id long, text string, source string",
    )
    for fn in (extract_web_documents, extract_web_documents_fused):
        got = {r["doc_id"]: r for r in fn(docs).collect()}
        assert set(got) == {1, 2, 3}, fn.__name__
        for d in (1, 2):
            r = got[d]
            assert (r["n_spans"], r["n_media"], r["n_blocks"]) == (0, 0, 0)
            assert r["first_block"] is None and r["main_text"] == ""
        assert got[3]["n_blocks"] > 0 and got[3]["first_block"] is not None


def test_run_web_idempotent_resume(spark, tmp_path):
    """Second run over the same input writes nothing; lineage totals
    cover exactly the committed docs (same contract as run_flagship)."""
    from cloud_ocr_summarizer_spark.plans.extract_web import run_web
    from cloud_ocr_summarizer_spark.sources.checkpoint import SnapshotSink

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    out, lin = str(tmp_path / "out"), str(tmp_path / "lineage")

    r1 = run_web(spark, docs, output_root=out, lineage_root=lin)
    assert r1.docs_written == 60 and r1.snapshot_id is not None

    r2 = run_web(spark, docs, output_root=out, lineage_root=lin)
    assert r2.docs_written == 0 and r2.snapshot_id is None

    committed = SnapshotSink(out).read_committed(spark)
    assert committed.count() == 60
    metrics = SnapshotSink(lin).read_committed(spark)
    agg = metrics.agg(
        F.sum("doc_count").alias("d"), F.sum("span_count").alias("s")
    ).first()
    assert agg["d"] == 60
    assert agg["s"] == committed.agg(F.sum("n_spans")).first()[0]


def test_fused_twin_zero_shuffle_and_equal(spark):
    """The fused variant carries the row-local span/layout stats through
    the DOM Arrow stage: ONE documents scan, ZERO Exchanges, and rows
    identical to the flat join plan."""
    from cloud_ocr_summarizer_spark.plans.extract_web import (
        extract_web_documents_fused,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    fused = extract_web_documents_fused(docs)
    p = fused._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert p.count("Scan parquet") == 1

    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, _web(spark).collect()))
    assert a == b and len(a) == docs.count()


def test_extract_web_single_join_is_only_shuffle(spark):
    """Both branches are map stages; the 1:1 doc_id equi-join is the
    pipeline's only shuffle boundary (one Exchange per join side), and
    nothing reintroduces a Window sort."""
    p = _web(spark)._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") <= 2
    assert "Window" not in p


def test_classified_variant_one_row_and_empty_docs(spark):
    """The full-Readability-classifier composed variant: one row per
    document, classifier counts surface renamed (layout n_blocks is
    preserved), and zero-word docs survive under ANSI mode."""
    from cloud_ocr_summarizer_spark.plans.extract_web import (
        extract_web_documents_classified,
    )

    docs = spark.createDataFrame(
        [
            (1, "", "s0"),
            (2, " ".join(f"w{i}" for i in range(16)), "s1"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["doc_id"]: r for r in extract_web_documents_classified(docs).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1["n_spans"], r1["n_media"], r1["n_blocks"]) == (0, 0, 0)
    assert r1["first_block"] is None and r1["main_text"] == ""
    assert r1["n_html_blocks"] == 0 and r1["n_html_dropped"] == 0
    r2 = got[2]
    assert r2["n_html_blocks"] == 2 and r2["n_spans"] > 0
    # doc 2 blocks: classes (2*31+0)%5=2 (fragment -> dropped) and
    # (2*31+1)%5=3 (plain 8 words -> kept)
    assert r2["n_html_dropped"] == 1
    assert r2["main_text"] == " ".join(f"w{i}" for i in range(8, 16))


def test_run_web_classified_pipeline_resume(spark, tmp_path):
    """The classified variant plugs into the same resume/lineage
    contract via run_web(pipeline=...): first run commits, rerun is a
    no-op, classifier columns survive the snapshot round trip."""
    from cloud_ocr_summarizer_spark.plans.extract_web import (
        extract_web_documents_classified,
        run_web,
    )
    from cloud_ocr_summarizer_spark.sources.checkpoint import SnapshotSink

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    out = str(tmp_path / "out")

    r1 = run_web(
        spark, docs, output_root=out, pipeline=extract_web_documents_classified
    )
    assert r1.docs_written == 40
    r2 = run_web(
        spark, docs, output_root=out, pipeline=extract_web_documents_classified
    )
    assert r2.docs_written == 0

    committed = SnapshotSink(out).read_committed(spark)
    assert committed.count() == 40
    assert {"n_html_blocks", "n_html_dropped"} <= set(committed.columns)
    assert committed.agg(F.sum("n_html_dropped")).first()[0] > 0


def test_classified_variant_single_join_is_only_shuffle(spark):
    """The classified DOM branch is still one Arrow map stage — the
    composed plan keeps the 1:1 equi-join as its only shuffle."""
    from cloud_ocr_summarizer_spark.plans.extract_web import (
        extract_web_documents_classified,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = (
        extract_web_documents_classified(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Exchange") <= 2
    assert "Window" not in p


def test_classified_fused_zero_shuffle_and_equal(spark):
    """The classified fused twin: zero Exchanges, rows identical to the
    flat classified plan."""
    from cloud_ocr_summarizer_spark.plans.extract_web import (
        extract_web_documents_classified,
        extract_web_documents_classified_fused,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    fused = extract_web_documents_classified_fused(docs)
    p = fused._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 0 and "Window" not in p
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, extract_web_documents_classified(docs).collect()))
    assert a == b and len(a) == 500
