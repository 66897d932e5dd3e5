"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake (clearly marked below): it "decodes" a blob into a pixel/
sample array derived from the blob bytes themselves. Everything around it —
the schema, the mapInPandas plumbing, batch shapes, partitioning — is the
real structure a decode/resize/frame-sample stage has at 100 TB scale:
binary columns never pass through the driver, decode runs once per blob
inside the batch, and feature rows are small.

A real deployment swaps ``_fake_decode`` for PIL/ffmpeg calls; nothing else
changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_KINDS = ("image", "audio", "video")


def make_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from `documents`: one opaque blob per doc
    with typed metadata — (media_id, kind, blob, width, height, n_frames,
    sample_rate). Deterministic in doc_id; blob = repeated md5 bytes of the
    text (stands in for encoded pixels/samples)."""
    import os

    # spread the downstream decode/feature mapInPandas stages off the
    # testdata table's single-file (1-partition) scan
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).repartition(spark.sparkContext.defaultParallelism)
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        # blob: md5(text) bytes tiled 64x — an opaque binary payload
        F.to_binary(F.repeat(F.md5("text"), 64), F.lit("hex")).alias("blob"),
        (F.pmod("doc_id", F.lit(16)) * 32 + 64).cast("int").alias("width"),
        (F.pmod("doc_id", F.lit(9)) * 32 + 64).cast("int").alias("height"),
        (F.pmod("doc_id", F.lit(24)) + 1).cast("int").alias("n_frames"),
        F.when(F.pmod("doc_id", F.lit(3)) == 1, 16000).otherwise(44100)
        .cast("int").alias("sample_rate"),
    )


def _fake_decode(blob: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE DECODE — the container has no codecs. Interprets
    the blob bytes as the decoded sample array. Replace with a real decoder
    (PIL / soundfile / ffmpeg) in production; the surrounding plumbing is
    unchanged."""
    return np.frombuffer(blob, dtype=np.uint8)


def media_features_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: decode + feature-extract per blob (vectorized numpy)."""
    for pdf in batches:
        feats = []
        for media_id, kind, blob, w, h in zip(
            pdf["media_id"], pdf["kind"], pdf["blob"], pdf["width"], pdf["height"]
        ):
            arr = _fake_decode(bytes(blob))
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
    """mapInPandas: 'resize' images to target×target via stride sampling of
    the fake-decoded array — the batch shape (one output blob per input
    blob, metadata updated) is the real resize stage's."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, blob, w, h in zip(pdf["media_id"], pdf["blob"], pdf["width"], pdf["height"]):
                arr = _fake_decode(bytes(blob))
                n = target * target
                idx = (np.arange(n) * max(1, arr.size // n)) % max(1, arr.size)
                rows.append({
                    "media_id": int(media_id),
                    "blob": arr[idx].tobytes(),
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
