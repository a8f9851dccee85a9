"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched mapInPandas
kernels.

The decode step itself is STUBBED (the image/audio libraries are not
in this container — see NotImplementedError markers and the
deterministic fake used by tests); everything Spark-side is real:
schemas, batch iteration, partition sizing, UDF signatures. Swapping
the fake for Pillow/torchaudio changes one function body, not the
plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("content", T.BinaryType()),     # opaque encoded bytes
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),      # typed metadata...
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
    T.StructField("feature_dim", T.IntegerType()),
])


def _dim(value, default: int) -> int:
    """Typed-metadata fallback: NULL (pandas NaN) or 0 -> default."""
    if value is None or (isinstance(value, float) and np.isnan(value)):
        return default
    return int(value) or default


def _tile_digest(digest: bytes, width: int, height: int) -> np.ndarray:
    """The deterministic fake frame all stub decoders share: digest
    bytes tiled to (height, width), scaled to [0, 1]."""
    flat = np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0
    reps = int(np.ceil(width * height / len(flat)))
    return np.tile(flat, reps)[: width * height].reshape(height, width)


def _mean_pool(img: np.ndarray, pool: int) -> np.ndarray:
    """Mean-pool to (pool, pool) — clamped so frames smaller than the
    pool grid in either dimension pool over what exists instead of
    crashing the reshape."""
    h, w = img.shape
    py, px = min(pool, h), min(pool, w)
    ph, pw = h // py, w // px
    return img[: ph * py, : pw * px].reshape(py, ph, px, pw).mean(axis=(1, 3))


def _decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """STUB — real implementation: PIL.Image.open(BytesIO(content)).

    Deterministic fake: bytes of the md5 digest tiled to (h, w),
    scaled to [0, 1]. Raises for non-fake inputs so nobody mistakes
    this for a real decoder."""
    if not content.startswith(b"FAKEIMG"):
        raise NotImplementedError(
            "real image decode requires an imaging library not present "
            "in this environment; test fixtures use FAKEIMG bytes")
    return _tile_digest(hashlib.md5(content).digest(), width, height)


def image_features(df: DataFrame, pool: int = 8) -> DataFrame:
    """Decode + resize-pool each image to a pool x pool mean grid ->
    feature vector. mapInPandas streams Arrow batches; binary payloads
    never materialize on the driver, and each output row drops the
    (large) content column immediately — the projection the plan needs
    at 100 TB."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for _, row in pdf.iterrows():
                img = _decode_image(row["content"],
                                    _dim(row["width"], 32),
                                    _dim(row["height"], 24))
                feats.append(_mean_pool(img, pool).ravel().tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "feature_dim": [len(f) for f in feats],
            })

    return (df.filter(F.col("kind") == "image")
            .mapInPandas(run, schema=FEATURE_SCHEMA))


def audio_frame_stats(df: DataFrame, frame_ms: int = 250) -> DataFrame:
    """Frame-sample audio into fixed windows and emit per-frame RMS.
    Decode is stubbed like images (FAKEAUD prefix -> deterministic
    waveform from the md5 digest)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if not bytes(row["content"]).startswith(b"FAKEAUD"):
                    raise NotImplementedError(
                        "real audio decode not available; fixtures use "
                        "FAKEAUD bytes")
                digest = hashlib.md5(bytes(row["content"])).digest()
                sr = int(row["sample_rate"]) or 8000
                n = int(sr * float(row["duration_s"]))
                base = np.frombuffer(digest, dtype=np.uint8).astype(float)
                wave = np.resize(base - base.mean(), n) / 255.0
                frame_len = max(int(sr * frame_ms / 1000), 1)
                for i in range(0, n - frame_len + 1, frame_len):
                    frame = wave[i:i + frame_len]
                    rows.append({
                        "media_id": row["media_id"],
                        "frame_idx": i // frame_len,
                        "rms": float(np.sqrt(np.mean(frame ** 2))),
                    })
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "rms"])

    return (df.filter(F.col("kind") == "audio")
            .mapInPandas(run, schema=out_schema))


def video_frame_features(df: DataFrame, every_nth: int = 5,
                         fps: float = 24.0, pool: int = 4) -> DataFrame:
    """Frame-sample video (every Nth frame) and mean-pool each sampled
    frame into a pool x pool feature — the decode-sample-project shape
    of a video training pipeline. Decode is stubbed like image/audio
    (FAKEVID prefix -> deterministic frames from the md5 digest +
    frame index); one input row fans out to n_frames/every_nth rows
    inside the Arrow kernel, so raw frames never exist as Spark rows."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_sec", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                if not content.startswith(b"FAKEVID"):
                    raise NotImplementedError(
                        "real video decode not available; fixtures use "
                        "FAKEVID bytes")
                w = _dim(row["width"], 16)
                h = _dim(row["height"], 12)
                n_frames = int(fps * float(row["duration_s"]))
                base = hashlib.md5(content).digest()
                for f_idx in range(0, n_frames, every_nth):
                    seed = hashlib.md5(base + f_idx.to_bytes(4, "big"))
                    frame = _tile_digest(seed.digest(), w, h)
                    rows.append({
                        "media_id": row["media_id"],
                        "frame_idx": f_idx,
                        "t_sec": f_idx / fps,
                        "feature": _mean_pool(frame, pool).ravel().tolist(),
                    })
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "t_sec", "feature"])

    return (df.filter(F.col("kind") == "video")
            .mapInPandas(run, schema=out_schema))


def make_fake_media(spark, n_images: int = 8, n_audio: int = 4,
                    n_video: int = 2) -> DataFrame:
    """Deterministic fixture rows for the stubbed decoders."""
    rows = []
    for i in range(n_images):
        rows.append((i, "image", b"FAKEIMG" + str(i).encode(), "image/fake",
                     32, 24, None, None))
    for i in range(n_audio):
        rows.append((1000 + i, "audio", b"FAKEAUD" + str(i).encode(),
                     "audio/fake", None, None, 8000, 1.0))
    for i in range(n_video):
        rows.append((2000 + i, "video", b"FAKEVID" + str(i).encode(),
                     "video/fake", 16, 12, None, 2.0))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
