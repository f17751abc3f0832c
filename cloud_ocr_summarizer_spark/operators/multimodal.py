"""Multimodal column plumbing: media decode / feature-extract over Arrow
batches.

Images/audio/video are opaque ``binary`` payloads (or ``media_ref`` URIs)
plus typed metadata.  The decode step itself is STUBBED — the sandbox has
no imaging libraries — behind an import gate; what IS real and tested is
everything Spark-side: the batch iterator shape, the output schema, the
vectorized pandas transform, and the deterministic fallback used by tests
and the driver's cross-check.

Fallback semantics (pure arithmetic on the ref string, SQL-expressible):
    width  = 64 + (7 * strlen(ref)) % 512
    height = 64 + (11 * strlen(ref)) % 512
    n_frames = 1 for images (.png/.jpg), 16 + strlen(ref) % 48 otherwise
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

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


def _decode_real(payload: bytes) -> tuple[int, int]:  # pragma: no cover
    """Real decode path — plugs in when an imaging lib is present."""
    raise NotImplementedError(
        "real media decode requires an imaging library not present in this "
        "environment; the deterministic fallback below exercises the same "
        "Spark plumbing"
    )


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
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def media_payload_features(span_rows: DataFrame) -> DataFrame:
    """Opaque BINARY payload plumbing: a ``binary`` column flows through
    Arrow into the pandas decode stub, which computes features from the
    ACTUAL BYTES (length, first byte -> fake dimensions).

    The payload here is synthesized deterministically (unhex(md5(ref)),
    16 bytes) because the testdata carries no real media; in production
    the column holds the encoded image/audio/video and only
    ``_decode_real`` changes.  What this pins down is the Spark-side
    contract: BinaryType schema, Arrow transfer of bytes into pandas,
    per-batch feature extraction, and the deterministic arithmetic the
    DuckDB oracle reproduces from the same md5.
    """
    media = span_rows.filter("media_ref IS NOT NULL").select(
        "doc_id",
        "media_ref",
        F.unhex(F.md5(F.col("media_ref").cast("binary"))).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf["payload"]  # Series[bytes] via Arrow
            n_bytes = payloads.map(len).astype("int32")
            first = payloads.map(lambda b: b[0]).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "n_bytes": n_bytes,
                    "first_byte": first.astype("int32"),
                    "width": (64 + (7 * first) % 512).astype("int32"),
                    "height": (64 + (11 * first) % 512).astype("int32"),
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
