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
