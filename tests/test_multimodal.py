"""Multimodal plumbing: stub-decode features, resize plan, frame sampling."""

from cloud_ocr_summarizer_spark.operators.multimodal import (
    frame_samples,
    media_features,
    resize_plan,
)


def test_media_pipeline_shapes_and_arithmetic(spark):
    rows = spark.createDataFrame(
        [
            (1, "gs://b/a.png"),        # image: 1 frame
            (1, "gs://b/clip.mp4"),     # other: 16 + len%48 frames
            (2, None),                  # no media -> filtered out
        ],
        "doc_id long, media_ref string",
    )
    feats = {r["media_ref"]: r for r in media_features(rows).collect()}
    assert set(feats) == {"gs://b/a.png", "gs://b/clip.mp4"}
    png = feats["gs://b/a.png"]
    n = len("gs://b/a.png")
    assert (png["media_kind"], png["width"], png["height"], png["n_frames"]) == (
        "image", 64 + 7 * n % 512, 64 + 11 * n % 512, 1
    )

    rp = {r["media_ref"]: r for r in resize_plan(media_features(rows)).collect()}
    for r in rp.values():
        longer = max(r["width"], r["height"])
        assert r["out_w"] == r["width"] * 224 // longer
        assert r["out_h"] == r["height"] * 224 // longer
        assert max(r["out_w"], r["out_h"]) == 224  # aspect-fit: longer side hits target

    fs = frame_samples(resize_plan(media_features(rows)), k=4).collect()
    by_ref = {}
    for r in fs:
        by_ref.setdefault(r["media_ref"], []).append(r["frame_idx"])
    assert by_ref["gs://b/a.png"] == [0]  # image: single frame
    clip = sorted(by_ref["gs://b/clip.mp4"])
    nf = feats["gs://b/clip.mp4"]["n_frames"]
    assert clip == [j * nf // 4 for j in range(4)]  # uniform stride


def test_frame_samples_small_frame_counts(spark):
    """1 < n_frames < k must sample each frame once, no dups or gaps."""
    import pyspark.sql.functions as F

    from cloud_ocr_summarizer_spark.operators.multimodal import frame_samples

    feats = spark.createDataFrame(
        [(1, "r3", "other", 3), (2, "r1", "image", 1), (3, "r16", "other", 16)],
        "doc_id long, media_ref string, media_kind string, n_frames int",
    )
    rows = frame_samples(feats, k=4).collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r["frame_idx"])
    assert sorted(by_ref["r3"]) == [0, 1, 2]
    assert by_ref["r1"] == [0]
    assert sorted(by_ref["r16"]) == [0, 4, 8, 12]


def test_media_payload_real_decode_roundtrip(spark):
    """End-to-end real decode: valid PNG/JPEG headers synthesized JVM-side,
    shipped as BINARY through Arrow, parsed back with the struct-only
    container parser; unknown containers yield NULL dims, never fakes."""
    from cloud_ocr_summarizer_spark.operators.multimodal import (
        media_payload_features,
    )

    rows = spark.createDataFrame(
        [(1, "gs://b/x.png"), (1, "gs://b/y.jpg"), (1, "gs://b/z.bin"), (1, None)],
        "doc_id long, media_ref string",
    )
    got = {r["media_ref"]: r for r in media_payload_features(rows).collect()}
    assert len(got) == 3  # null media_ref filtered
    png = got["gs://b/x.png"]
    n = len("gs://b/x.png")
    assert (png["format"], png["n_bytes"]) == ("png", 33)
    assert (png["width"], png["height"]) == (16 + 7 * n % 496, 16 + 11 * n % 496)
    jpg = got["gs://b/y.jpg"]
    n = len("gs://b/y.jpg")
    assert (jpg["format"], jpg["n_bytes"]) == ("jpeg", 41)
    assert (jpg["width"], jpg["height"]) == (16 + 7 * n % 496, 16 + 11 * n % 496)
    unk = got["gs://b/z.bin"]
    assert (unk["format"], unk["n_bytes"]) == ("unknown", 16)
    assert unk["width"] is None and unk["height"] is None


def test_parse_image_dimensions_real_files():
    """The parser reads REAL encoder output, not just our synthesized
    headers: a 5x3 PNG from zlib-only encoding and a JPEG with multiple
    leading segments before its SOF0 (the marker scan must skip them)."""
    import struct
    import zlib

    from cloud_ocr_summarizer_spark.operators.multimodal import (
        parse_image_dimensions,
    )

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    raw = b"".join(b"\x00" + b"\x00\x00\x00" * 5 for _ in range(3))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 3, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert parse_image_dimensions(png) == ("png", 5, 3)

    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
        + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x10" * 64  # DQT
        + b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x00\x00"          # DHT (not SOF!)
        + b"\xff\xc2" + struct.pack(">H", 11)                            # progressive SOF2
        + b"\x08" + struct.pack(">HH", 77, 123) + b"\x01\x11\x00"
    )
    assert parse_image_dimensions(jpeg) == ("jpeg", 123, 77)
    assert parse_image_dimensions(b"\x00\x01\x02") is None
    assert parse_image_dimensions(b"\xff\xd8\xff\xd9") is None  # no SOF


def test_jpeg_fill_bytes_before_marker(spark):
    """ITU T.81 B.1.1.2 allows 0xFF fill-byte padding before a marker —
    the scan must skip it, not read it as a segment length."""
    import struct as _struct

    from cloud_ocr_summarizer_spark.operators.multimodal import (
        parse_image_dimensions,
    )

    sof = b"\xff\xc0" + _struct.pack(">HBHH", 11, 8, 77, 55) + b"\x03"
    padded = b"\xff\xd8" + b"\xff" * 5 + sof
    assert parse_image_dimensions(padded) == ("jpeg", 55, 77)
