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


def test_media_payload_binary_roundtrip(spark):
    """The BINARY payload must arrive in pandas as real bytes: first_byte
    equals the first byte of md5(ref)."""
    import hashlib

    from cloud_ocr_summarizer_spark.operators.multimodal import (
        media_payload_features,
    )

    rows = spark.createDataFrame(
        [(1, "gs://b/x.png"), (1, None)], "doc_id long, media_ref string"
    )
    got = media_payload_features(rows).collect()
    assert len(got) == 1  # null media_ref filtered
    r = got[0]
    digest = hashlib.md5(b"gs://b/x.png").digest()
    assert r["n_bytes"] == 16
    assert r["first_byte"] == digest[0]
    assert r["width"] == 64 + (7 * digest[0]) % 512
    assert r["height"] == 64 + (11 * digest[0]) % 512
