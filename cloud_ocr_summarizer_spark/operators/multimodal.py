"""Multimodal column plumbing: media decode / feature-extract over Arrow
batches.

Images/audio/video are opaque ``binary`` payloads (or ``media_ref`` URIs)
plus typed metadata.  The image decode step is REAL — a pure-``struct``
container-header parser (PNG IHDR / JPEG SOF dimensions, no imaging
library needed); pixel-level work (resample, frame extraction) remains
out of scope for this sandbox and is represented by the arithmetic plans
(``resize_plan``, ``frame_samples``).

Ref-only feature path (no payload; pure arithmetic on the ref string,
SQL-expressible — used when only URIs are available):
    width  = 64 + (7 * strlen(ref)) % 512
    height = 64 + (11 * strlen(ref)) % 512
    n_frames = 1 for images (.png/.jpg), 16 + strlen(ref) % 48 otherwise
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers (dimensions live in the SOF segment);
# 0xC4/0xC8/0xCC are DHT/JPG/DAC, not frames.
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_image_dimensions(payload: bytes) -> tuple[str, int, int] | None:
    """REAL image decode: container-header parse with ``struct`` only.

    PNG: 8-byte signature, then the IHDR chunk — width/height are the
    two big-endian uint32s at bytes 16..24 (PNG spec §11.2.2).
    JPEG: SOI marker, then scan marker segments to the first SOF frame
    header — lines/samples are the big-endian uint16s after the
    precision byte (ITU T.81 §B.2.2).

    Returns (format, width, height), or None for an unrecognized
    container (caller decides the unknown-format policy) — never a fake
    dimension.
    """
    if payload[:8] == _PNG_SIG and payload[12:16] == b"IHDR":
        if len(payload) < 24:  # truncated/corrupt upload: unknown, not a crash
            return None
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", w, h)
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                break
            # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may pad a
            # marker — skip them, or the fill byte pair would be
            # misread as a segment length and jump past the SOF
            while i + 4 <= len(payload) and payload[i + 1] == 0xFF:
                i += 1
            if i + 4 > len(payload):
                break
            marker = payload[i + 1]
            if marker in _JPEG_SOF:
                if i + 9 > len(payload):
                    break
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return ("jpeg", w, h)
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            i += 2 + seg_len
        return None
    return None


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    refs = pdf["media_ref"].fillna("")
    n = refs.str.len().astype("int64")
    # lowercase to match the oracle SQL (and any real-world '.PNG' refs)
    ext = refs.str.extract(r"(\.[^./]+)$", expand=False).fillna("").str.lower()
    is_image = ext.isin([".png", ".jpg", ".jpeg"])
    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_ref": pdf["media_ref"],
            "media_kind": is_image.map({True: "image", False: "other"}),
            "width": (64 + (7 * n) % 512).astype("int32"),
            "height": (64 + (11 * n) % 512).astype("int32"),
            "n_frames": (is_image.map({True: 1, False: 0}) * 1
                         + (~is_image) * (16 + n % 48)).astype("int32"),
        }
    )
    return out


def resize_plan(features: DataFrame, *, target: int = 224) -> DataFrame:
    """Aspect-fit resize arithmetic: scale the longer side to ``target``.

    out_w = floor(width  * target / max(width, height))
    out_h = floor(height * target / max(width, height))
    Pure column expressions (the actual pixel resample is the stubbed
    decode step); deterministic, SQL-expressible.
    """
    g = F.greatest("width", "height")
    return features.select(
        "doc_id",
        "media_ref",
        "media_kind",
        "width",
        "height",
        "n_frames",
        F.floor(F.col("width") * target / g).cast("int").alias("out_w"),
        F.floor(F.col("height") * target / g).cast("int").alias("out_h"),
    )


def frame_samples(features: DataFrame, *, k: int = 4) -> DataFrame:
    """Evenly-spaced frame sampling: for each media row take
    kk = min(k, n_frames) frames at idx_j = floor(j * n_frames / kk) — the
    standard uniform-stride video sampler, one output row per frame.
    (Dividing by kk, not k: with 1 < n_frames < k the k-divisor form
    duplicates index 0 and skips tail frames.)  Row-local explode; no
    shuffle."""
    kk = F.least(F.lit(k), F.col("n_frames"))
    idxs = F.when(
        F.col("n_frames") > 0,
        F.transform(
            F.sequence(F.lit(0), kk - 1),
            lambda j: F.floor(j * F.col("n_frames") / kk).cast("int"),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return features.withColumn("frame_idx", F.explode(idxs))


PAYLOAD_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def synth_image_payload_col(ref: Column) -> Column:
    """Deterministic VALID image payloads for refs (the testdata carries
    no real media): ``.png`` refs get a spec-correct PNG signature+IHDR
    (33 bytes), ``.jpg``/``.jpeg`` a spec-correct JPEG SOI+APP0+SOF0+EOI
    (41 bytes) — dimensions encoded big-endian exactly where the
    containers put them — and anything else 16 opaque md5 bytes (the
    unknown-format case).  Encoded dimensions derive from the ref:
    w = 16 + (7*strlen) % 496, h = 16 + (11*strlen) % 496 — what the
    DuckDB oracle recomputes to check the decoder round-trip.
    Pure column expressions (hex-string concat -> unhex), JVM-side.
    """
    n = F.length(ref)
    w = (16 + F.pmod(7 * n, F.lit(496))).cast("int")
    h = (16 + F.pmod(11 * n, F.lit(496))).cast("int")
    hex8 = lambda c: F.lpad(F.lower(F.hex(c)), 8, "0")  # noqa: E731
    hex4 = lambda c: F.lpad(F.lower(F.hex(c)), 4, "0")  # noqa: E731
    png_hex = F.concat(
        # signature + IHDR len(13) + "IHDR"
        F.lit("89504e470d0a1a0a0000000d49484452"),
        hex8(w),
        hex8(h),
        # bit depth 8, color 6, compression/filter/interlace 0, crc 0
        F.lit("080600000000000000"),
    )
    jpeg_hex = F.concat(
        # SOI + APP0/JFIF (len 16)
        F.lit("ffd8ffe000104a46494600010100000100010000"),
        # SOF0 (len 17): precision 8, lines, samples, 3 components
        F.lit("ffc0001108"),
        hex4(h),
        hex4(w),
        F.lit("03011100021101031101"),
        F.lit("ffd9"),  # EOI
    )
    ext = F.lower(F.regexp_extract(ref, r"(\.[^./]+)$", 1))
    payload_hex = (
        F.when(ext == ".png", png_hex)
        .when(ext.isin(".jpg", ".jpeg"), jpeg_hex)
        .otherwise(F.md5(ref.cast("binary")))
    )
    return F.unhex(payload_hex)


def media_payload_features(span_rows: DataFrame) -> DataFrame:
    """Opaque BINARY payload plumbing with a REAL decode: a ``binary``
    column flows through Arrow into a pandas batch stage that parses the
    ACTUAL BYTES with ``parse_image_dimensions`` (PNG IHDR / JPEG SOF,
    struct-only — no imaging library).

    Payloads are synthesized as valid minimal containers
    (``synth_image_payload_col``) because the testdata carries no real
    media; in production the column holds the real encoded bytes and
    NOTHING here changes — the parser reads the same headers.  Unknown
    containers (the ``.bin`` refs) decode to format='unknown' with NULL
    dimensions, never fake ones.  The DuckDB oracle recomputes the
    dimensions the payloads were synthesized with, so a value-check
    failure means the decoder misread real bytes.
    """
    media = span_rows.filter("media_ref IS NOT NULL").select(
        "doc_id",
        "media_ref",
        synth_image_payload_col(F.col("media_ref")).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf["payload"]  # Series[bytes] via Arrow
            decoded = payloads.map(parse_image_dimensions)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "format": decoded.map(
                        lambda d: d[0] if d else "unknown"
                    ),
                    "width": decoded.map(lambda d: d[1] if d else None).astype(
                        "Int32"
                    ),
                    "height": decoded.map(lambda d: d[2] if d else None).astype(
                        "Int32"
                    ),
                }
            )

    return media.mapInPandas(run, schema=PAYLOAD_FEATURE_SCHEMA)


def media_features(span_rows: DataFrame) -> DataFrame:
    """Feature-extract every media span (mapInPandas over Arrow batches).

    Input: flat span rows with (doc_id, media_ref, ...); only rows with a
    media_ref are processed.  Output: MEDIA_FEATURE_SCHEMA.
    """
    media = span_rows.filter("media_ref IS NOT NULL").select("doc_id", "media_ref")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _extract_batch(pdf)

    return media.mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)
