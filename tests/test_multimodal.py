"""Multimodal plumbing: schema-true binary handling with stubbed decode."""

from __future__ import annotations

import hashlib

import pytest

from ontology_pipeline_spark.operators.multimodal import (
    extract_media_features,
    resize_images,
    sample_video_frames,
)
from ontology_pipeline_spark.schemas import MEDIA


def _media(spark):
    rows = [
        ("m1", "image", b"\x89PNG fake bytes", "image/png", 64, 64, None),
        ("m2", "audio", b"RIFF fake wave", "audio/wav", None, None, 2500),
        ("m3", "video", b"\x00\x00ftyp fake", "video/mp4", 640, 480, 3500),
        ("m4", "image", None, "image/png", None, None, None),
    ]
    return spark.createDataFrame(rows, schema=MEDIA)


def test_feature_extraction_stub_deterministic(spark):
    out = {r["media_id"]: r for r in extract_media_features(_media(spark)).collect()}
    assert out["m1"]["n_bytes"] == 15
    assert out["m1"]["sha1"] == hashlib.sha1(b"\x89PNG fake bytes").hexdigest()
    assert len(out["m1"]["feature"]) == 8
    assert abs(sum(out["m1"]["feature"]) - 1.0) < 1e-3  # histogram sums to ~1
    assert out["m4"]["feature"] is None and out["m4"]["n_bytes"] == 0
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in extract_media_features(_media(spark)).collect()}
    assert again["m2"] == out["m2"]["feature"]


def test_real_decode_is_explicit_stub(spark):
    with pytest.raises(Exception) as ei:
        extract_media_features(_media(spark), stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or "decoder" in str(ei.value)


def test_resize_seam_raises_cleanly(spark):
    with pytest.raises(Exception):
        resize_images(_media(spark), 32, 32).collect()


def test_video_frame_sampling(spark):
    rows = sample_video_frames(_media(spark), every_ms=1000).collect()
    got = sorted((r["media_id"], r["frame_ts_ms"]) for r in rows)
    assert got == [("m3", 0), ("m3", 1000), ("m3", 2000), ("m3", 3000)]


def test_video_frame_sampling_null_and_zero_duration(spark):
    """Regression: NULL/0-duration videos emitted a phantom ts=0 frame."""
    from ontology_pipeline_spark.operators.multimodal import sample_video_frames

    media = spark.createDataFrame(
        [("m1", "video", None), ("m2", "video", 0), ("m3", "video", 2500)],
        ["media_id", "kind", "duration_ms"],
    )
    rows = sample_video_frames(media, every_ms=1000).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert "m1" not in by_id and "m2" not in by_id
    assert sorted(by_id["m3"]) == [0, 1000, 2000]


def test_image_dimensions_real_parse(spark):
    """Header parsing is REAL (pure byte arithmetic): PNG IHDR and JPEG SOF
    dimensions decode without any imaging library; garbage yields NULLs."""
    import struct

    from ontology_pipeline_spark.operators.multimodal import image_dimensions

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    )
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9   # APP0 (14-byte payload)
        + b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"                   # DHT (not a frame)
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 1080, 1920) + b"\x03" + b"\x00" * 3            # SOF0: h=1080 w=1920
    )
    media = spark.createDataFrame(
        [("p1", bytearray(png)), ("j1", bytearray(jpeg)), ("x1", bytearray(b"not an image")), ("n1", None)],
        "media_id string, payload binary",
    )
    got = {r["media_id"]: (r["format"], r["width"], r["height"]) for r in image_dimensions(media).collect()}
    assert got["p1"] == ("png", 640, 480)
    assert got["j1"] == ("jpeg", 1920, 1080)
    assert got["x1"] == (None, None, None)
    assert got["n1"] == (None, None, None)
