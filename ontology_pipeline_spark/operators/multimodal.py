"""Multimodal columns: opaque binary payloads with typed metadata.

Engine extension for training-data pipelines: image/audio/video travel as
`binary` columns next to typed metadata (schemas.MEDIA).  The Spark-side
plumbing — schema, partitioning, Arrow batch shape, UDF signatures — is real
and tested; the actual codec work is STUBBED because no image/audio libraries
exist in this container:

* `decode_stub=True` (default) computes deterministic fake features
  (byte-statistics vector) so pipelines are end-to-end testable;
* `decode_stub=False` raises NotImplementedError at the decode seam, which is
  exactly where a real decoder (PIL/ffmpeg/torchaudio) plugs in — the
  surrounding mapInPandas contract does not change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import MEDIA_FEATURES

FEATURE_DIM = 8


def _decode_and_featurize(payload: bytes | None, kind: str, stub: bool) -> list[float] | None:
    if payload is None:
        return None
    if not stub:
        raise NotImplementedError(
            "real media decoding requires an image/audio library not present "
            "in this environment; plug a decoder in here"
        )
    # deterministic fake feature: byte-histogram moments (stands in for an
    # image embedding / audio fingerprint; stable across runs and engines)
    n = len(payload)
    if n == 0:
        return [0.0] * FEATURE_DIM
    counts = [0] * 8
    for b in payload:
        counts[b >> 5] += 1
    return [round(c / n, 6) for c in counts]


def extract_media_features(
    media: DataFrame,
    stub: bool = True,
    payload_col: str = "payload",
) -> DataFrame:
    """media -> (media_id, kind, n_bytes, sha1, feature) via one Arrow-batched
    mapInPandas stage (narrow; binary bytes never leave the executor)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "kind", "n_bytes", "sha1", "feature"]
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf[payload_col]):
                b = bytes(payload) if payload is not None else None
                rows.append(
                    (
                        mid,
                        kind,
                        len(b) if b is not None else 0,
                        hashlib.sha1(b).hexdigest() if b is not None else "",
                        _decode_and_featurize(b, kind, stub),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "kind", payload_col).mapInPandas(
        run, schema=MEDIA_FEATURES
    )


def _png_dimensions(b: bytes) -> tuple[int, int] | None:
    """PNG: IHDR is always the first chunk — width/height are big-endian
    uint32 at bytes 16-24 (after the 8-byte signature + 8-byte chunk header)."""
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    import struct

    w, h = struct.unpack(">II", b[16:24])
    return (w, h)


def _jpeg_dimensions(b: bytes) -> tuple[int, int] | None:
    """JPEG: walk the marker segments to the first SOF0-SOF15 frame header
    (skipping the non-frame markers in that range: DHT/JPG/DAC), where
    height/width are big-endian uint16 at offsets 3/5 into the segment."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    import struct

    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        # spec-legal 0xFF fill bytes may pad the space before a marker
        while i + 1 < len(b) and b[i + 1] == 0xFF:
            i += 1
        if i + 4 > len(b):
            return None
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            i += 2
            continue
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(b):
                return None
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return (w, h)
        i += 2 + seg_len
    return None


def image_dimensions(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL (non-stub) metadata decode: (media_id, format, width, height)
    parsed from PNG IHDR / JPEG SOF headers with pure byte arithmetic — no
    imaging library needed, so this path runs for real in any environment.
    Unrecognized/truncated payloads yield NULL dimensions (never raise)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "format", "width", "height"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                fmt, dims = None, None
                png = _png_dimensions(b)
                if png is not None:
                    fmt, dims = "png", png
                else:
                    jpg = _jpeg_dimensions(b)
                    if jpg is not None:
                        fmt, dims = "jpeg", jpg
                rows.append(
                    (mid, fmt, dims[0] if dims else None, dims[1] if dims else None)
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", payload_col).mapInPandas(
        run, schema="media_id string, format string, width long, height long"
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize seam: schema-true stub (passes payloads through a
    mapInPandas with the declared contract; the resize itself requires an
    image library)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError(
                "image resize requires an imaging library not present in this "
                "environment; the Spark contract (schema/batching) is in place"
            )

    return media.mapInPandas(run, schema=media.schema)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling seam: emits (media_id, frame_ts_ms) rows for stub
    payloads by slicing duration_ms metadata — real decoders replace the
    frame extraction, the row contract stays."""
    return (
        media.filter(
            # NULL/zero-duration videos have no decodable frames: emitting a
            # phantom ts=0 row would feed nonexistent frames downstream
            (F.col("kind") == "video") & (F.coalesce(F.col("duration_ms"), F.lit(0)) > 0)
        )
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("duration_ms") - 1,
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
