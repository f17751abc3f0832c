"""Unit tests for the pure-Python oracle — the executable spec itself.

These pin the reference semantics (file:line in oracle.py docstrings) on
hand-computed cases, independent of Spark.
"""

from cloud_ocr_summarizer_spark import config, oracle


def test_normalize_block_text_collapses_and_strips():
    # words joined with ' ' then strip (vision_processor.py:361-363);
    # paragraphs joined with '\n' then strip (:323-325)
    assert oracle.normalize_block_text("  hello   world  ") == "hello world"
    assert oracle.normalize_block_text("a\tb\n  c  d ") == "a b\nc d"
    assert oracle.normalize_block_text("\n\n x \n\n") == "x"
    # interior empty paragraph survives as an empty line
    assert oracle.normalize_block_text("a\n\nb") == "a\n\nb"
    assert oracle.normalize_block_text("") == ""
    assert oracle.normalize_block_text(None) is None


def test_classify_kind_enum_and_raw():
    assert oracle.classify_kind(1) == "TEXT"
    assert oracle.classify_kind(3) == "PICTURE"
    assert oracle.classify_kind(99) == "UNKNOWN"
    assert oracle.classify_kind("TABLE") == "TABLE"
    assert oracle.classify_kind("html") == "TEXT"
    assert oracle.classify_kind("JPG") == "PICTURE"
    assert oracle.classify_kind("weird") == "UNKNOWN"
    assert oracle.classify_kind(None) == "UNKNOWN"


def test_mime_for_name():
    assert oracle.mime_for_name("a/b/report.PDF") == "application/pdf"
    assert oracle.mime_for_name("x.jpeg") == "image/jpeg"
    assert oracle.mime_for_name("noext") == "application/octet-stream"


def test_extract_document_orders_and_routes():
    spans = [
        {"kind": "TEXT", "text": " b  b ", "media_ref": None, "offset": 2},
        {"kind": "png", "text": "ignored", "media_ref": "gs://x/1.png", "offset": 1},
        {"kind": "TEXT", "text": "a", "media_ref": "gs://leak", "offset": 0},
    ]
    out = oracle.extract_document(spans)
    assert out == [
        ("TEXT", "a", None, 0),  # media_ref nulled for text kinds
        ("PICTURE", None, "gs://x/1.png", 1),  # text nulled for media kinds
        ("TEXT", "b b", None, 2),
    ]


def test_extract_document_confidence_gate():
    spans = [
        {"kind": "TEXT", "text": "keep", "offset": 0, "confidence": 0.9},
        {"kind": "TEXT", "text": "drop", "offset": 1, "confidence": 0.5},
        {"kind": "TEXT", "text": "nullconf", "offset": 2, "confidence": None},
    ]
    out = oracle.extract_document(spans, min_confidence=0.7)
    assert [t[1] for t in out] == ["keep", "nullconf"]


def test_extract_document_duplicate_offsets_deterministic():
    spans = [
        {"kind": "TEXT", "text": "z", "offset": 0},
        {"kind": "TEXT", "text": "a", "offset": 0},
        {"kind": "PICTURE", "media_ref": "gs://m", "offset": 0},
    ]
    out = oracle.extract_document(spans)
    # tie-break (kind, text, media_ref): PICTURE < TEXT; 'a' < 'z'
    assert out == [
        ("PICTURE", None, "gs://m", 0),
        ("TEXT", "a", None, 0),
        ("TEXT", "z", None, 0),
    ]


def test_token_counting():
    assert oracle.token_count_text("one two  three\nfour") == 4
    assert oracle.token_count_text("") == 0
    assert oracle.token_count_text(None) == 1
    # recursive structure rules (token_counter.py:60-82)
    assert oracle.count_structure({"a": "x y", "b": [1, None, "z"]}) == (1 + 2) + (1 + 3)


def test_primary_language_stable_ties_and_defaults():
    pages = [[], [{"language_code": "fr", "confidence": 0.5},
               {"language_code": "de", "confidence": 0.9}]]
    assert oracle.primary_language(pages) == "de"
    ties = [[{"language_code": "fr", "confidence": 0.5},
             {"language_code": "de", "confidence": 0.5}]]
    assert oracle.primary_language(ties) == "fr"  # stable sort keeps arrival order
    assert oracle.primary_language([[]]) == "en"  # gemini.py:113
    assert oracle.primary_language([[]], default=config.DEFAULT_LANGUAGE_JA) == "ja"


def test_rollup_requires_more_than_one():
    assert oracle.rollup_text(["a", "b"]) == "a\nb"
    assert oracle.rollup_text(["only"]) is None
    assert oracle.rollup_text(["a", None, "", "b"]) == "a\nb"
    assert oracle.rollup_text([]) is None
