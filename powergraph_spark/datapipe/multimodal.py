"""Multimodal columns: image/audio/video as opaque binary + metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, partition-aware
mapInPandas kernels — is real and tested; the codec step is STUBBED
(this container has no image/audio libraries). Each stub is a
deterministic fake gated behind `_HAVE_CODECS`; swapping in PIL/
torchaudio later changes only the inner function, not the Spark plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HAVE_CODECS = False  # no PIL/libav in this container

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, note string"
THUMB_SCHEMA = "media_id long, thumb binary, width int, height int"
FRAME_SCHEMA = "media_id long, frame_index int, frame binary"


def synthesize_media(spark, n: int, seed: int = 42, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (binary payloads derived from the
    id so any parallelism yields the same bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids.tolist():
                kind = ["image", "audio", "video"][i % 3]
                rng = np.random.RandomState((seed * 1_000_003 + i) % 2**31)
                payload = rng.bytes(256 + (i % 512))
                rows.append((
                    i, kind, payload,
                    64 + i % 64 if kind != "audio" else 0,
                    48 + i % 48 if kind != "audio" else 0,
                    16000 if kind == "audio" else 0,
                    30 if kind == "video" else (1 if kind == "image" else 0),
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "width", "height",
                "sample_rate", "n_frames",
            ])

    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: deterministic fake decode. Real impl: PIL.Image.open.
    raise NotImplementedError if strict codec behavior is required."""
    if _HAVE_CODECS:  # pragma: no cover
        raise NotImplementedError("real codec path not available")
    arr = np.frombuffer(payload, dtype=np.uint8)
    size = max(1, width) * max(1, height)
    return np.resize(arr, size).reshape(max(1, height), max(1, width))


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Per-item feature vector via mapInPandas (Arrow batches). For
    images: coarse intensity histogram of the (stub-)decoded pixels;
    audio/video: byte-level stats. Deterministic."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-ITEM work is the codec call itself (irreducible once real
        # codecs land); everything around it is numpy over raw column
        # arrays — no pandas row objects (iterrows) in the loop.
        for b in batches:
            feats, notes = [], []
            for kind, payload, w, h in zip(
                b["kind"].to_numpy(), b["payload"].to_numpy(),
                b["width"].to_numpy(), b["height"].to_numpy(),
            ):
                payload = bytes(payload)
                if kind == "image":
                    img = _decode_image_stub(payload, w, h)
                    hist, _ = np.histogram(img, bins=dim, range=(0, 255))
                    f = (hist / max(1, img.size)).astype(np.float32)
                    notes.append("stub-decode:image")
                else:
                    arr = np.frombuffer(payload, dtype=np.uint8)
                    chunks = np.array_split(arr.astype(np.float32), dim)
                    f = np.array([c.mean() if len(c) else 0.0 for c in chunks],
                                 dtype=np.float32) / 255.0
                    notes.append(f"stub-decode:{kind}")
                feats.append(f.tolist())
            yield pd.DataFrame({
                "media_id": b["media_id"], "kind": b["kind"],
                "feature": feats, "note": notes,
            })

    return media.mapInPandas(kern, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Thumbnail kernel (stub: nearest-neighbor subsample of the fake
    pixel grid). Real impl swaps the inner two lines for PIL."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b[b["kind"] == "image"]
            rows = []
            for mid, payload, w, h in zip(
                b["media_id"].to_numpy(), b["payload"].to_numpy(),
                b["width"].to_numpy(), b["height"].to_numpy(),
            ):
                img = _decode_image_stub(bytes(payload), w, h)
                ys = np.linspace(0, img.shape[0] - 1, out_h).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, out_w).astype(int)
                thumb = img[np.ix_(ys, xs)].astype(np.uint8).tobytes()
                rows.append((mid, thumb, out_w, out_h))
            yield pd.DataFrame(rows, columns=["media_id", "thumb", "width", "height"])

    return media.mapInPandas(kern, schema=THUMB_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: emit one (stub) frame per
    every_n frames. Real impl: pyav keyframe iteration."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b[b["kind"] == "video"]
            rows = []
            for mid, payload, nf in zip(
                b["media_id"].to_numpy(), b["payload"].to_numpy(),
                b["n_frames"].to_numpy(),
            ):
                payload = bytes(payload)
                for fi in range(0, int(nf), every_n):
                    frame = payload[fi % max(1, len(payload) - 16):][:16]
                    rows.append((mid, fi, frame))
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "frame"])

    return media.mapInPandas(kern, schema=FRAME_SCHEMA)
