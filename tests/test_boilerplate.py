"""Cross-document boilerplate span removal (operators/boilerplate.py).

Constructed corpus with a real repeated footer, per-source scoping,
within-doc repeats, media passthrough, normalization, and the dictionary
rank cap — the semantics the sf-tier oracle check can only brush."""

import pytest
from pyspark.sql import types as T

from cloud_ocr_summarizer_spark.operators.boilerplate import (
    boilerplate_dictionary,
    boilerplate_drop_audit,
    remove_boilerplate_spans,
)

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("source", T.StringType()),
    ]
)


def _t(text, off):
    return ("TEXT", text, None, off)


def _m(ref, off):
    return ("PICTURE", None, ref, off)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # source A: footer repeats across docs 1-3 -> boilerplate
        (1, [_t("unique alpha", 0), _t("Home About Contact", 1), _m("gs://x/1", 2)], "A"),
        (2, [_t("Home About Contact", 0), _t("unique beta", 1)], "A"),
        # doc 3: same footer but case/edge-whitespace variant -> same fp
        (3, [_t("  home about contact ", 5), _t("unique gamma", 6)], "A"),
        # doc 4, source B: same text, only doc in B with it -> kept
        (4, [_t("Home About Contact", 0)], "B"),
        # doc 5, source A: nothing but the footer -> emits no rows
        (5, [_t("Home About Contact", 0)], "A"),
        # doc 6, source B: within-doc repeat only -> distinct-doc df=1, kept
        (6, [_t("repeat me", 0), _t("repeat me", 1)], "B"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_dictionary_per_source_distinct_docs(corpus):
    dic = {(r["source"], r["df"]) for r in boilerplate_dictionary(corpus, min_df=2).collect()}
    # only source A's footer qualifies: 4 distinct A-docs carry it
    assert dic == {("A", 4)}


def test_removal_scopes_drops_and_renumbers(corpus):
    out = remove_boilerplate_spans(corpus, min_df=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r["seq"])
    # footer dropped from every A doc; survivors renumbered contiguously
    assert [(r["seq"], r["kind"], r["text"], r["media_ref"]) for r in by_doc[1]] == [
        (1, "TEXT", "unique alpha", None),
        (2, "PICTURE", None, "gs://x/1"),
    ]
    assert by_doc[1][1]["offset"] == 2  # original offset retained
    assert [r["text"] for r in by_doc[2]] == ["unique beta"]
    assert [r["text"] for r in by_doc[3]] == ["unique gamma"]
    # source B untouched: df counted per source, not globally
    assert [r["text"] for r in by_doc[4]] == ["Home About Contact"]
    # all-boilerplate doc vanishes
    assert 5 not in by_doc
    # within-doc repetition is not cross-doc boilerplate
    assert [r["text"] for r in by_doc[6]] == ["repeat me", "repeat me"]
    assert [r["seq"] for r in by_doc[6]] == [1, 2]


def test_no_boilerplate_is_identity(spark):
    df = spark.createDataFrame(
        [(1, [_t("one", 0), _m("gs://m", 1)], "A"), (2, [_t("two", 0)], "B")],
        SCHEMA,
    )
    out = remove_boilerplate_spans(df, min_df=2)
    assert out.count() == 3
    assert remove_boilerplate_spans(spark.createDataFrame([], SCHEMA)).count() == 0


def test_rank_cap_fires_and_audits(spark):
    # two boilerplate fps in one source; cap keeps the higher-df one
    rows = []
    for d in range(4):
        spans = [_t("footer one", 0)]
        if d < 2:
            spans.append(_t("footer two", 1))
        spans.append(_t(f"unique {d}", 2))
        rows.append((d, spans, "A"))
    df = spark.createDataFrame(rows, SCHEMA)
    out = remove_boilerplate_spans(df, min_df=2, max_dict=1)
    texts = sorted(r["text"] for r in out.collect())
    # "footer one" (df=4) removed, "footer two" (df=2, rk=2 > cap) survives
    assert "footer one" not in texts and texts.count("footer two") == 2
    audit = boilerplate_drop_audit(df, min_df=2, max_dict=1).collect()[0]
    assert audit["cap_name"] == "boilerplate_dict"
    assert audit["dropped_groups"] == 1 and audit["dropped_rows"] == 2
    zero = boilerplate_drop_audit(df, min_df=2, max_dict=10).collect()[0]
    assert zero["dropped_groups"] == 0 and zero["dropped_rows"] == 0


def test_partitioning_invariance(spark):
    """Same result set under 1-partition and highly-fragmented input —
    the dictionary agg and broadcast filter are partitioning-blind."""
    rows = []
    for d in range(30):
        src = "A" if d % 2 else "B"
        spans = [_t("shared footer", 0), _t(f"unique {d}", 1), _m(f"gs://{d}", 2)]
        rows.append((d, spans, src))
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, remove_boilerplate_spans(df.coalesce(1), min_df=2).collect()))
    b = sorted(map(tuple, remove_boilerplate_spans(df.repartition(13), min_df=2).collect()))
    assert a == b and len(a) == 60  # footer dropped from all 30 docs
