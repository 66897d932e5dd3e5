"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched pandas UDFs.

IMAGES are REAL: blobs are actual PNG files (kernel/pngkit.py — stdlib
zlib/struct codec, CRC-validated chunks, all five scanline filters) whose
pixel content is the deterministic gradient ``pixel[i] = i % 256``, so the
decoded features stay closed-form for the DuckDB oracle while the decode
path runs a genuine inflate + unfilter over genuine compressed bytes.

AUDIO/VIDEO remain deterministic fakes (``_fake_decode`` below — the
container ships no codec for those and none is expressible in stdlib):
the blob's own bytes stand in for the decoded samples. Everything around
the seam — the schema, the mapInPandas plumbing, batch shapes,
partitioning — is the real structure a decode/resize/frame-sample stage
has at 100 TB scale: binary columns never pass through the driver, decode
runs once per blob inside the batch, and feature rows are small. A real
deployment swaps ``_fake_decode`` for soundfile/ffmpeg calls; nothing
else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel import pngkit

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = (
    "media_id long, kind string, blob binary, width int, height int, "
    "n_frames int, sample_rate int"
)


def _media_row(doc_id: int, text: str) -> dict:
    import hashlib

    kind = MEDIA_KINDS[doc_id % 3]
    w = (doc_id % 16) * 32 + 64
    h = (doc_id % 9) * 32 + 64
    if kind == "image":
        blob = pngkit.png_encode(
            pngkit.gradient_image(w, h), level=6, filter_type=2
        )
    else:
        # md5(text) hex tiled 64× then hex-decoded — 1024 opaque bytes
        blob = bytes.fromhex(hashlib.md5(text.encode()).hexdigest() * 64)
    return {
        "media_id": doc_id,
        "kind": kind,
        "blob": blob,
        "width": w,
        "height": h,
        "n_frames": (doc_id % 24) + 1,
        "sample_rate": 16000 if doc_id % 3 == 1 else 44100,
    }


def make_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from `documents`: one opaque blob per doc
    with typed metadata — (media_id, kind, blob, width, height, n_frames,
    sample_rate). Deterministic in doc_id; image blobs are real PNGs of
    the closed-form gradient, audio/video blobs are md5-derived opaque
    bytes (see module docstring)."""
    import os

    # spread the blob-encode + downstream decode/feature mapInPandas
    # stages off the testdata table's single-file (1-partition) scan
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = MEDIA_SCHEMA.replace(" long", "").replace(" string", "") \
            .replace(" binary", "").replace(" int", "").split(", ")
        for pdf in batches:
            rows = [
                _media_row(int(d), t)
                for d, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(blob: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE DECODE for audio/video — the container has no
    codecs for those. Interprets the blob bytes as the decoded sample
    array. Replace with a real decoder (soundfile / ffmpeg) in
    production; the surrounding plumbing is unchanged."""
    return np.frombuffer(blob, dtype=np.uint8)


def decode_media(kind: str, blob: bytes) -> np.ndarray:
    """The decode seam: REAL PNG inflate+unfilter for images, documented
    fake for audio/video."""
    if kind == "image":
        return pngkit.png_decode(blob).reshape(-1)
    return _fake_decode(blob)


def media_features_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: decode + feature-extract per blob (vectorized numpy).
    Image rows run the real PNG decode — a gate over this function only
    passes if inflate + unfilter reproduce the gradient byte-exactly."""
    for pdf in batches:
        feats = []
        for media_id, kind, blob, w, h in zip(
            pdf["media_id"], pdf["kind"], pdf["blob"], pdf["width"], pdf["height"]
        ):
            arr = decode_media(kind, bytes(blob))
            hist = np.bincount(arr, minlength=256).astype(np.float64)
            p = hist / max(1, arr.size)
            nz = p[p > 0]
            feats.append({
                "media_id": int(media_id),
                "kind": kind,
                "n_bytes": int(arr.size),
                "mean_val": float(arr.mean()) if arr.size else 0.0,
                "entropy": float(-(nz * np.log2(nz)).sum()),
            })
        yield pd.DataFrame(feats, columns=["media_id", "kind", "n_bytes", "mean_val", "entropy"])


MEDIA_FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, mean_val double, entropy double"
)


def image_resize_fn(target: int = 64):
    """mapInPandas: resize PNG images to target×target via nearest-neighbor
    stride sampling of the REAL decoded pixel grid, re-encoded as PNG —
    one output blob per input blob, metadata updated, decode+encode both
    inside the Arrow batch (the real thumbnail stage's shape)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, blob, w, h in zip(pdf["media_id"], pdf["blob"], pdf["width"], pdf["height"]):
                img = pngkit.png_decode(bytes(blob))
                ih, iw = img.shape
                ys = (np.arange(target) * ih) // target
                xs = (np.arange(target) * iw) // target
                small = img[np.ix_(ys, xs)]
                rows.append({
                    "media_id": int(media_id),
                    "blob": pngkit.png_encode(small, level=6, filter_type=2),
                    "width": target,
                    "height": target,
                })
            yield pd.DataFrame(rows, columns=["media_id", "blob", "width", "height"])

    return fn


RESIZE_SCHEMA = "media_id long, blob binary, width int, height int"


def frame_sample_fn(every: int = 4):
    """mapInPandas: sample every k-th 'frame' of video blobs — one output
    row per sampled frame (posexplode-like fan-out inside the UDF)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, blob, n_frames in zip(pdf["media_id"], pdf["blob"], pdf["n_frames"]):
                arr = _fake_decode(bytes(blob))
                per = max(1, arr.size // max(1, int(n_frames)))
                for f in range(0, int(n_frames), every):
                    frame = arr[f * per : (f + 1) * per]
                    rows.append({
                        "media_id": int(media_id),
                        "frame_no": f,
                        "frame_mean": float(frame.mean()) if frame.size else 0.0,
                    })
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame_mean"])

    return fn


FRAME_SCHEMA = "media_id long, frame_no int, frame_mean double"
