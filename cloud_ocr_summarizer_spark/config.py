"""Engine configuration constants.

Derived from the reference's config/settings.py (values cited per line) but
re-scoped for a distributed engine: everything here is a plain constant so it
serializes into task closures without surprises.
"""

from __future__ import annotations

# --- span kind vocabulary -------------------------------------------------
# Reference: block-type enum map, src/processors/vision_processor.py:289-296.
KIND_UNKNOWN = "UNKNOWN"
KIND_TEXT = "TEXT"
KIND_TABLE = "TABLE"
KIND_PICTURE = "PICTURE"
KIND_RULER = "RULER"
KIND_BARCODE = "BARCODE"

BLOCK_TYPES = {
    0: KIND_UNKNOWN,
    1: KIND_TEXT,
    2: KIND_TABLE,
    3: KIND_PICTURE,
    4: KIND_RULER,
    5: KIND_BARCODE,
}

# Kinds that carry assembled text vs an opaque media reference.
TEXT_KINDS = (KIND_TEXT, KIND_TABLE)
MEDIA_KINDS = (KIND_PICTURE, KIND_BARCODE)

# Raw ingest kinds (file-extension style) mapped into the canonical
# vocabulary.  Reference analogue: extension allow-list + mime map,
# config/settings.py:65,84-89 (pdf/png/jpg/jpeg), where text-bearing
# formats flow to OCR TEXT blocks and images become PICTURE media.
RAW_KIND_MAP = {
    "html": KIND_TEXT,
    "pdf": KIND_TEXT,
    "txt": KIND_TEXT,
    "png": KIND_PICTURE,
    "jpg": KIND_PICTURE,
    "jpeg": KIND_PICTURE,
}

# --- mime dispatch ----------------------------------------------------------
# Reference: config/settings.py:84-89 + default at vision_processor.py:99-105.
MIME_MAP = {
    ".pdf": "application/pdf",
    ".png": "image/png",
    ".jpg": "image/jpeg",
    ".jpeg": "image/jpeg",
}
MIME_DEFAULT = "application/octet-stream"

# --- gates ------------------------------------------------------------------
# Reference: max_file_size 10 MB, config/settings.py:66 (gate applied at
# vision_processor.py:43-48).  Here it caps the total text payload per doc.
MAX_DOC_TEXT_BYTES = 10 * 1024 * 1024

# Reference: min_confidence_threshold default 0.0, config/settings.py:109,
# applied vision_processor.py:261-264 (detailed mode drops blocks below).
MIN_CONFIDENCE_THRESHOLD = 0.0

# --- language selection -----------------------------------------------------
# The two reference entry points disagree on the fallback language:
# gemini.py:113 -> 'en', claude.py:190 -> 'ja'.  Modeled as a knob.
DEFAULT_LANGUAGE_EN = "en"
DEFAULT_LANGUAGE_JA = "ja"

# --- batching ---------------------------------------------------------------
# Reference: max_pages_per_request=5 (settings.py:90), batch_size=10
# (settings.py:100).  In Spark these become Arrow batch sizing knobs.
# Round-2 A/B note: a SEQUENTIAL sweep (2048..32768, ascending) showed a
# ~30% "win" for bigger batches, but INTERLEAVED A/Bs in two sessions
# (alternating 2048/8192, both orders) measure 2048 at 1.41-1.53 s vs
# 8192 at 1.50-1.83 s on 1M docs — the sequential result was host-drift,
# not amortization.  Keep 2048: no measured benefit above it, and batch
# memory scales with spans (a span-heavy batch of 8k rows is 4x the
# footprint).  Always interleave batch-size A/Bs on this host.
ARROW_MAX_RECORDS_PER_BATCH = 2048

# --- skew handling ----------------------------------------------------------
# Salt modulus for the salted repartition on hash(doc_id); see
# operators/skew.py.  SURVEY.md §4.3(1).
DEFAULT_SALT_BUCKETS = 8

# --- flagship span derivation (documents -> interleaved spans) --------------
# Deterministic interleaver used to build the (doc_id, spans) table from the
# flat `documents` testdata table.  Mirrors FIXTURES.md §1 knobs: word-chunk
# spans with a 25% media fraction.
SPAN_WORDS_PER_CHUNK = 8
MEDIA_EVERY = 4  # span i of doc d is media iff (d*31 + i) % MEDIA_EVERY == 0
MEDIA_REF_PREFIX = "gs://corpus/"
