"""Multimodal pipeline queries (driver north star: binary media
columns + typed metadata at 100 TB).

Two tiers, matching functions/multimodal.py:
- multimodal_wav_rms / multimodal_ppm_features run REAL codecs (pure
  numpy RIFF/PCM-16 WAV and binary-PPM parsers) over real-format bytes
  built from a deterministic per-doc sample/pixel formula, so the
  decoded values have an exact DuckDB oracle that evaluates the same
  formula arithmetically — full value-bearing correctness rows.
- The FAKE*-prefixed queries keep exercising the plumbing for formats
  that genuinely need codec libraries (JPEG/MP3/MP4); those remain
  rows-only by contract. Spark-side everything is real in both tiers:
  binary column construction, mapInPandas Arrow batching, immediate
  projection of the wide content column, explode-in-kernel fan-out.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from radio_data_pipeline_spark.functions.multimodal import (
    audio_frame_stats,
    encode_ppm,
    encode_wav_pcm16,
    image_features,
    video_frame_features,
)
from radio_data_pipeline_spark.plans.registry import register
from radio_data_pipeline_spark.sources.parquet import load_table


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic media table from `documents`: each doc
    becomes one fake-encoded image (content = FAKEIMG || utf8(text))
    and docs divisible by 4 also a fake audio clip. At scale this
    models the real layout — media bytes inline in parquet rows (or a
    path column for object-store offloading), typed metadata columns
    carrying what the decoder needs."""
    docs = load_table(spark, sf_dir, "documents")
    images = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(F.lit(b"FAKEIMG"), F.encode("text", "UTF-8"))
         .alias("content"),
        F.lit("image/fake").alias("mime"),
        F.lit(32).alias("width"), F.lit(24).alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("double").alias("duration_s"),
    )
    video = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("media_id"),
        F.lit("video").alias("kind"),
        F.concat(F.lit(b"FAKEVID"), F.encode("text", "UTF-8"))
         .alias("content"),
        F.lit("video/fake").alias("mime"),
        F.lit(16).alias("width"), F.lit(12).alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(2.0).alias("duration_s"),
    )
    audio = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("media_id"),
        F.lit("audio").alias("kind"),
        F.concat(F.lit(b"FAKEAUD"), F.encode("text", "UTF-8"))
         .alias("content"),
        F.lit("audio/fake").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(8000).alias("sample_rate"),
        F.lit(0.5).alias("duration_s"),
    )
    return images.unionByName(audio).unionByName(video)


# deterministic media-generation parameters shared by the Spark
# kernels and the SQL oracles (any drift breaks the hash match)
_WAV_SR = 8000
_WAV_N = 4000            # 0.5 s
_WAV_FRAME_MS = 250      # -> 2000-sample frames, 2 per clip
_PPM_W, _PPM_H = 32, 24
_PPM_POOL_X, _PPM_POOL_Y = 4, 3   # 8x8 output grid


def _wav_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One REAL PCM-16 WAV clip per document: sample j of doc d is
    ((d*31 + j*7) % 201 - 100) * 64 — a formula both engines can
    evaluate, so the decoded output is exactly checkable. The encode
    happens in an Arrow kernel; the container bytes then flow through
    the same binary-column path any external WAV corpus would."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ])

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        j = np.arange(_WAV_N, dtype=np.int64)
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                samples = ((int(d) * 31 + j * 7) % 201 - 100) * 64
                rows.append({
                    "media_id": int(d), "kind": "audio",
                    "content": encode_wav_pcm16(samples, _WAV_SR),
                    "mime": "audio/wav", "width": None, "height": None,
                    "sample_rate": _WAV_SR,
                    "duration_s": _WAV_N / _WAV_SR,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return docs.mapInPandas(enc, schema=schema)


@register(
    "multimodal_wav_rms",
    oracle=f"""
    SELECT d.doc_id AS media_id,
           CAST(r.j // {_WAV_SR * _WAV_FRAME_MS // 1000} AS INT)
             AS frame_idx,
           round(sqrt(avg(pow(
             CAST((d.doc_id * 31 + r.j * 7) % 201 - 100 AS DOUBLE)
             * 64 / 32768.0, 2))), 6) AS rms
    FROM documents d, range({_WAV_N}) r(j)
    GROUP BY d.doc_id, r.j // {_WAV_SR * _WAV_FRAME_MS // 1000}
    ORDER BY media_id, frame_idx
    """,
    doc="REAL RIFF/PCM-16 WAV decode -> 250 ms frame RMS, with a full "
        "value-bearing oracle: clips are genuine WAV containers built "
        "from a deterministic sample formula, parsed back by the pure-"
        "numpy chunk-walking decoder (functions/multimodal.py "
        "decode_wav, tested against the stdlib wave writer), so DuckDB "
        "can verify every decoded frame value arithmetically.",
    tags=("multimodal", "mapInPandas", "wav"),
)
def multimodal_wav_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = audio_frame_stats(_wav_media(spark, sf_dir),
                               frame_ms=_WAV_FRAME_MS)
    return (frames.select("media_id", "frame_idx",
                          F.round("rms", 6).alias("rms"))
            .orderBy("media_id", "frame_idx"))


def _ppm_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One REAL binary-PPM (P6) image per document: channel c of pixel
    (y, x) of doc d is (d*7 + y*13 + x*5 + c*3) % 256."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        y = np.arange(_PPM_H).reshape(-1, 1, 1)
        x = np.arange(_PPM_W).reshape(1, -1, 1)
        c = np.arange(3).reshape(1, 1, -1)
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                img = ((int(d) * 7 + y * 13 + x * 5 + c * 3) % 256
                       ).astype(np.uint8)
                rows.append({
                    "media_id": int(d), "kind": "image",
                    "content": encode_ppm(img), "mime": "image/x-portable-pixmap",
                    "width": _PPM_W, "height": _PPM_H,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return docs.mapInPandas(enc, schema=schema)


@register(
    "multimodal_ppm_features",
    oracle=f"""
    SELECT d.doc_id AS media_id,
           CAST((y.i // {_PPM_POOL_Y}) * 8 + (x.j // {_PPM_POOL_X}) AS INT)
             AS cell,
           round(avg((
             CAST((d.doc_id * 7 + y.i * 13 + x.j * 5) % 256 AS DOUBLE)
             + CAST((d.doc_id * 7 + y.i * 13 + x.j * 5 + 3) % 256 AS DOUBLE)
             + CAST((d.doc_id * 7 + y.i * 13 + x.j * 5 + 6) % 256 AS DOUBLE)
           ) / 3.0 / 255.0), 6) AS value
    FROM documents d, range({_PPM_H}) y(i), range({_PPM_W}) x(j)
    GROUP BY d.doc_id, (y.i // {_PPM_POOL_Y}) * 8 + (x.j // {_PPM_POOL_X})
    ORDER BY media_id, cell
    """,
    doc="REAL binary-PPM decode -> grayscale 8x8 mean-pool features "
        "with a full value-bearing oracle: genuine P6 containers built "
        "from a deterministic pixel formula, parsed by the pure-numpy "
        "header+raster parser (functions/multimodal.py decode_ppm), "
        "every pooled cell checked arithmetically by DuckDB.",
    tags=("multimodal", "mapInPandas", "ppm"),
)
def multimodal_ppm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.functions.multimodal import decode_ppm

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                rgb = decode_ppm(bytes(row["content"]))
                gray = rgb.astype(np.float64).mean(axis=2) / 255.0
                pooled = gray.reshape(8, _PPM_POOL_Y, 8, _PPM_POOL_X) \
                             .mean(axis=(1, 3))
                for cell, v in enumerate(pooled.ravel()):
                    rows.append({"media_id": row["media_id"],
                                 "cell": cell, "value": round(float(v), 6)})
            yield pd.DataFrame(rows,
                               columns=["media_id", "cell", "value"])

    return (_ppm_media(spark, sf_dir)
            .mapInPandas(run, schema=out_schema)
            .orderBy("media_id", "cell"))


@register(
    "multimodal_image_features",
    oracle=None,  # decode kernel is a mapInPandas stub — rows-only check
    doc="Image decode -> 8x8 mean-pool feature extraction over binary "
        "media rows derived from documents (functions/multimodal.py "
        "image_features). The content column is projected away inside "
        "the Arrow kernel, so only 64 doubles per row survive the map "
        "stage — the shape that keeps a 100 TB media scan shuffle-free.",
    tags=("multimodal", "mapInPandas"),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = image_features(_media_from_documents(spark, sf_dir), pool=8)
    return feats.select(
        "media_id", "kind", "feature_dim",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x)
                / F.col("feature_dim"), 6).alias("feature_mean"),
    ).orderBy("media_id")


@register(
    "multimodal_audio_frame_rms",
    oracle=None,  # decode kernel is a mapInPandas stub — rows-only check
    doc="Audio frame-sampling -> per-frame RMS over binary media rows "
        "(functions/multimodal.py audio_frame_stats): one input row "
        "fans out to duration/frame_ms rows inside the Arrow kernel — "
        "the explode-in-kernel pattern that avoids materializing "
        "decoded waveforms as Spark rows.",
    tags=("multimodal", "mapInPandas"),
)
def multimodal_audio_frame_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = audio_frame_stats(_media_from_documents(spark, sf_dir),
                               frame_ms=250)
    return (frames.select("media_id", "frame_idx",
                          F.round("rms", 6).alias("rms"))
            .orderBy("media_id", "frame_idx"))


@register(
    "multimodal_video_frame_sample",
    oracle=None,  # decode kernel is a mapInPandas stub — rows-only check
    doc="Video frame-sampling (every 5th of 48 frames) -> per-frame "
        "4x4 mean-pool features (functions/multimodal.py "
        "video_frame_features): decode-sample-project inside the Arrow "
        "kernel, raw frames never materialize as Spark rows.",
    tags=("multimodal", "mapInPandas"),
)
def multimodal_video_frame_sample(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    frames = video_frame_features(_media_from_documents(spark, sf_dir),
                                  every_nth=5, fps=24.0, pool=4)
    return frames.select(
        "media_id", "frame_idx", F.round("t_sec", 6).alias("t_sec"),
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x)
                / F.size("feature"), 6).alias("feature_mean"),
    ).orderBy("media_id", "frame_idx")


_BMP_W, _BMP_H = 16, 16


def _bmp_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One REAL uncompressed 24-bit BMP per document: channel c of
    pixel (y, x) of doc d is (d*11 + y*17 + x*3 + c*7) % 256. The
    container exercises the parts PPM doesn't: little-endian binary
    headers, a pixel-array offset, BGR order, bottom-up rows, 4-byte
    row padding."""
    from radio_data_pipeline_spark.functions.multimodal import encode_bmp

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ])

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        y = np.arange(_BMP_H).reshape(-1, 1, 1)
        x = np.arange(_BMP_W).reshape(1, -1, 1)
        c = np.arange(3).reshape(1, 1, -1)
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                img = ((int(d) * 11 + y * 17 + x * 3 + c * 7) % 256
                       ).astype(np.uint8)
                rows.append({"media_id": int(d),
                             "content": encode_bmp(img),
                             "mime": "image/bmp"})
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return docs.mapInPandas(enc, schema=schema)


@register(
    "multimodal_bmp_row_means",
    oracle=f"""
    SELECT d.doc_id AS media_id,
           CAST(y.i AS INT) AS row_idx,
           round(avg(
             CAST((d.doc_id * 11 + y.i * 17 + x.j * 3 + c.k * 7) % 256
                  AS DOUBLE) / 255.0), 6) AS row_mean
    FROM documents d, range({_BMP_H}) y(i), range({_BMP_W}) x(j),
         range(3) c(k)
    GROUP BY d.doc_id, y.i
    ORDER BY media_id, row_idx
    """,
    doc="REAL BMP decode -> per-row mean intensity with a full "
        "value-bearing oracle: genuine BITMAPFILEHEADER/INFOHEADER "
        "containers (BGR, bottom-up, padded rows) built from a "
        "deterministic pixel formula, parsed by the pure-numpy BMP "
        "parser (functions/multimodal.py decode_bmp); the decoded "
        "orientation and channel order are proven by DuckDB evaluating "
        "the same formula arithmetically — a flipped or BGR-swapped "
        "decode changes row means and fails the hash.",
    tags=("multimodal", "mapInPandas", "bmp"),
)
def multimodal_bmp_row_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.functions.multimodal import decode_bmp

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("row_idx", T.IntegerType()),
        T.StructField("row_mean", T.DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                rgb = decode_bmp(bytes(row["content"]))
                means = rgb.astype(np.float64).mean(axis=(1, 2)) / 255.0
                for y, v in enumerate(means):
                    rows.append({"media_id": row["media_id"],
                                 "row_idx": y,
                                 "row_mean": round(float(v), 6)})
            yield pd.DataFrame(rows,
                               columns=["media_id", "row_idx", "row_mean"])

    return (_bmp_media(spark, sf_dir)
            .mapInPandas(run, schema=out_schema)
            .orderBy("media_id", "row_idx"))
