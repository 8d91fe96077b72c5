"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides through the engine as ``binary`` columns
with a typed metadata struct — the lakehouse-native layout for multimodal
training data.  The Spark-side plumbing (schemas, batch shapes, mapInPandas
signatures, partitioning) is real and tested; the actual codecs are NOT
available in this container, so the decode kernels are deterministic fakes
gated behind ``fake=True`` / raise ``NotImplementedError`` otherwise.
Swapping in Pillow/ffmpeg later only replaces the kernel body — the plan
shape is already the production one (Arrow-batched mapInPandas, no
per-row Python, metadata pushdown-friendly).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("phash", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table (seeded bytes)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(42 + int(i))
                kind = ["image", "audio", "video"][int(i) % 3]
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "payload": rng.integers(0, 256, size=256, dtype=np.uint8).tobytes(),
                        "mime": {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        "width": 64 + int(i) % 512 if kind != "audio" else None,
                        "height": 64 + int(i) % 256 if kind != "audio" else None,
                        "duration_ms": 1000 + int(i) * 10 if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _byte_entropy(buf: bytes) -> float:
    if not buf:
        return 0.0
    counts = np.bincount(np.frombuffer(buf, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / len(buf)
    return float(-(p * np.log2(p)).sum())


def image_features(media: DataFrame, fake: bool = True, thumb_size: int = 8) -> DataFrame:
    """Decode → perceptual-hash → thumbnail, as Arrow-batched mapInPandas.

    ``fake=True`` uses a deterministic stand-in decoder (payload bytes
    reshaped as a grayscale grid); ``fake=False`` raises — real codecs are
    not installed in this environment.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires Pillow/libjpeg, not present in this container"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for _, r in b.iterrows():
                buf = bytes(r["payload"] or b"")
                # fake decode: treat payload as a 16x16 grayscale image
                arr = np.frombuffer(buf[:256].ljust(256, b"\0"), dtype=np.uint8).reshape(16, 16)
                # fake resize: 2x2 block mean to thumb_size
                step = 16 // thumb_size
                thumb = arr[::step, ::step]
                # perceptual hash: bits = pixel > median
                bits = (thumb > np.median(thumb)).ravel()[:64]
                weights = (np.uint64(1) << np.arange(len(bits), dtype=np.uint64))
                phash = int((bits * weights).sum(dtype=np.uint64).astype(np.int64))
                out.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(buf),
                        "byte_entropy": _byte_entropy(buf),
                        "phash": phash,
                        "thumb": thumb.tobytes(),
                    }
                )
            yield pd.DataFrame(out)

    imgs = media.where(F.col("kind") == "image")
    return imgs.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling (1 row per sampled frame)."""
    if not fake:
        raise NotImplementedError("real frame extraction requires ffmpeg")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for _, r in b.iterrows():
                dur = int(r["duration_ms"] or 0)
                buf = bytes(r["payload"] or b"")
                for j, ts in enumerate(range(0, dur, every_ms)):
                    lo = (j * 16) % max(len(buf) - 16, 1)
                    out.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": j,
                            "frame_ts_ms": ts,
                            "frame": buf[lo : lo + 16],
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    vids = media.where(F.col("kind") == "video")
    return vids.mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)
