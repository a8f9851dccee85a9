"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched mapInPandas
kernels.

Decoders, two tiers:
- REAL codecs for the public container formats that need no external
  library: RIFF/PCM-16 WAV (decode_wav/encode_wav_pcm16) and binary
  PPM "P6" images (decode_ppm/encode_ppm), both pure numpy + struct.
  These carry value-bearing oracles (plans/multimodal.py) and are
  unit-tested against the stdlib ``wave`` writer as an independent
  implementation.
- STUBS for formats that genuinely require codec libraries
  (JPEG/MP3/MP4...): the FAKE* deterministic fakes below raise
  NotImplementedError on real bytes. Swapping in Pillow/torchaudio
  changes one function body, not the plan.

Everything Spark-side is real either way: schemas, Arrow batch
iteration, partition sizing, explode-in-kernel fan-out.
"""

from __future__ import annotations

import hashlib
import struct
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


def _secs(value, default: float = 1.0) -> float:
    """duration_s fallback: NULL (pandas NaN) or 0 -> default — the
    float twin of _dim, so NULL metadata degrades to the default
    instead of int(NaN) killing the Arrow kernel task."""
    if value is None or (isinstance(value, float) and np.isnan(value)):
        return default
    return float(value) or default


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


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal canonical RIFF/WAVE container around 16-bit PCM mono
    samples (public format: RIFF chunk grammar + WAVE fmt/data)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_pcm8(samples: np.ndarray, sample_rate: int) -> bytes:
    """RIFF/WAVE container around 8-bit UNSIGNED PCM mono samples
    (the historical 8-bit WAV convention: silence = 0x80)."""
    pcm = np.asarray(samples, dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """Real RIFF/WAVE parser for PCM mono (16-bit signed and 8-bit
    unsigned): walks the chunk grammar (id, little-endian size,
    word-aligned payloads), validates the fmt chunk, returns
    (sample_rate, int16 sample array) — 8-bit samples are converted to
    int16 via the standard (b - 128) << 8 mapping so callers see one
    sample domain regardless of container bit depth.

    Raises ValueError on malformed containers and NotImplementedError
    on WAVE encodings beyond PCM mono 8/16-bit (compressed/float/
    multichannel would need a real audio library)."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, end = 12, min(12 + struct.unpack("<I", content[4:8])[0], len(content))
    sample_rate = None
    bits = None
    data = None
    while pos + 8 <= end:
        cid = content[pos:pos + 4]
        size = struct.unpack("<I", content[pos + 4:pos + 8])[0]
        payload = content[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(payload) < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16])
            if audio_fmt != 1 or channels != 1 or bits not in (8, 16):
                raise NotImplementedError(
                    f"only PCM mono 8/16-bit supported (fmt={audio_fmt}, "
                    f"channels={channels}, bits={bits})")
        elif cid == b"data":
            data = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits == 8:
        return sample_rate, (
            (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128)
            << 8)
    return sample_rate, np.frombuffer(
        data[: len(data) - (len(data) % 2)], dtype="<i2")


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary PPM ("P6") encoder: (h, w, 3) uint8 -> header + raw
    RGB bytes (public netpbm format)."""
    h, w, c = img.shape
    assert c == 3
    return (f"P6\n{w} {h}\n255\n".encode("ascii")
            + np.asarray(img, dtype=np.uint8).tobytes())


def _parse_netpbm_header(content: bytes, magic: bytes,
                         kind: str) -> tuple[int, int, int]:
    """Shared binary-netpbm header walk: '<magic>', then whitespace/
    comment-separated width, height, maxval tokens, one whitespace
    byte. Returns (w, h, raster_start)."""
    if content[:2] != magic:
        raise ValueError(f"not a binary {kind} ({magic.decode()}) image")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(content) and content[pos:pos + 1].isspace():
            pos += 1
        if content[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(content) and content[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos:pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError(f"truncated {kind} header")
        tokens.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError(f"16-bit {kind} not supported")
    if maxval != 255:
        # the decode paths normalize by a fixed 255; a smaller maxval
        # would silently mis-scale, so refuse instead
        raise NotImplementedError(
            f"{kind} maxval {maxval} != 255 not supported")
    return w, h, pos


def decode_ppm(content: bytes) -> np.ndarray:
    """Real binary-PPM parser ('P6' + w*h*3 raw RGB bytes). Returns
    (h, w, 3) uint8. Raises ValueError on malformed input and
    NotImplementedError for maxval > 255 (16-bit PPM)."""
    w, h, pos = _parse_netpbm_header(content, b"P6", "PPM")
    need = w * h * 3
    raster = content[pos:pos + need]
    if len(raster) < need:
        raise ValueError(f"PPM raster truncated: {len(raster)} < {need}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_pgm(img: np.ndarray) -> bytes:
    """Binary PGM ("P5") encoder: (h, w) uint8 grayscale -> header +
    raw bytes (public netpbm format)."""
    h, w = img.shape
    return (f"P5\n{w} {h}\n255\n".encode("ascii")
            + np.asarray(img, dtype=np.uint8).tobytes())


def decode_pgm(content: bytes) -> np.ndarray:
    """Real binary-PGM parser ('P5' + w*h raw grayscale bytes).
    Returns (h, w) uint8; same header grammar (incl. comments) as
    PPM."""
    w, h, pos = _parse_netpbm_header(content, b"P5", "PGM")
    need = w * h
    raster = content[pos:pos + need]
    if len(raster) < need:
        raise ValueError(f"PGM raster truncated: {len(raster)} < {need}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w)


def encode_y4m(frames: np.ndarray, fps_num: int = 24,
               fps_den: int = 1) -> bytes:
    """YUV4MPEG2 (Y4M) encoder for grayscale video: (n, h, w) uint8
    frames -> stream header + per-frame 'FRAME\\n' + luma plane
    (public format; 'Cmono' = luma-only color space)."""
    n, h, w = frames.shape
    head = (f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 Cmono\n"
            .encode("ascii"))
    parts = [head]
    for f in np.asarray(frames, dtype=np.uint8):
        parts.append(b"FRAME\n" + f.tobytes())
    return b"".join(parts)


def decode_y4m(content: bytes) -> tuple[float, np.ndarray]:
    """Real YUV4MPEG2 parser for the mono (luma-only) case: stream
    header tokens (W/H/F mandatory, C colorspace), then FRAME-prefixed
    planes. Returns (fps, (n, h, w) uint8 array). Raises ValueError on
    malformed streams and NotImplementedError for chroma-subsampled
    color spaces (C420/C444... carry chroma planes a real video stack
    would hand to a decoder library)."""
    nl = content.find(b"\n")
    if not content.startswith(b"YUV4MPEG2") or nl < 0:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = None
    colorspace = "C420jpeg"  # the format's default when absent
    for tok in content[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            num, _, den = t[1:].partition(":")
            # corrupt rate -> structured error: missing/zero denominator
            # AND negative numerator/denominator (a sign-flipped byte
            # would otherwise return fps=-24.0 as a "valid" decode)
            if not den or int(den) <= 0 or int(num) <= 0:
                raise ValueError(f"malformed Y4M frame rate {t!r}")
            fps = int(num) / int(den)
        elif t.startswith("C"):
            colorspace = t
    if not w or not h or not fps:
        raise ValueError("Y4M header missing W/H/F")
    if w < 0 or h < 0:
        # negative dims would make frame_size negative and walk `pos`
        # BACKWARD below — an infinite loop on corrupt input
        raise ValueError(f"invalid Y4M dimensions {w}x{h}")
    if colorspace != "Cmono":
        raise NotImplementedError(
            f"only Cmono Y4M supported ({colorspace} carries chroma "
            "planes — use a video library for subsampled formats)")
    frames = []
    pos = nl + 1
    frame_size = w * h
    while pos < len(content):
        fnl = content.find(b"\n", pos)
        if fnl < 0 or content[pos:pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M FRAME marker")
        plane = content[fnl + 1:fnl + 1 + frame_size]
        if len(plane) < frame_size:
            raise ValueError("truncated Y4M frame plane")
        frames.append(np.frombuffer(plane, dtype=np.uint8).reshape(h, w))
        pos = fnl + 1 + frame_size
    return fps, (np.stack(frames) if frames
                 else np.empty((0, h, w), dtype=np.uint8))


def _decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """Image decode to a grayscale [0, 1] array.

    Real paths: binary PPM ("P6") via decode_ppm (grayscale = RGB
    mean), binary PGM ("P5") via decode_pgm, and uncompressed 24-bit
    BMP ("BM") via decode_bmp. Fake path:
    FAKEIMG-prefixed fixture bytes -> md5 digest tiled to (h, w).
    Anything else (JPEG/PNG/...) raises — those formats need an
    imaging library not present in this environment (PIL.Image.open
    is the drop-in)."""
    content = bytes(content)
    if content[:2] == b"P6":
        rgb = decode_ppm(content)
        return rgb.astype(np.float64).mean(axis=2) / 255.0
    if content[:2] == b"P5":
        return decode_pgm(content).astype(np.float64) / 255.0
    if content[:2] == b"BM":
        rgb = decode_bmp(content)
        return rgb.astype(np.float64).mean(axis=2) / 255.0
    if not content.startswith(b"FAKEIMG"):
        raise NotImplementedError(
            "only PPM (P6) / PGM (P5) / BMP decode natively; JPEG/PNG "
            "need "
            "an imaging library not present in this environment; test "
            "fixtures use FAKEIMG bytes")
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
                content = bytes(row["content"])
                if content[:4] == b"RIFF":
                    # real path: PCM-16 WAV; container metadata wins
                    # over the (possibly stale) table metadata
                    sr, samples = decode_wav(content)
                    wave = samples.astype(np.float64) / 32768.0
                    n = len(wave)
                elif content.startswith(b"FAKEAUD"):
                    digest = hashlib.md5(content).digest()
                    sr = _dim(row["sample_rate"], 8000)
                    n = int(sr * _secs(row["duration_s"]))
                    base = np.frombuffer(digest, dtype=np.uint8).astype(float)
                    wave = np.resize(base - base.mean(), n) / 255.0
                else:
                    raise NotImplementedError(
                        "only RIFF/PCM-16 WAV decodes natively; "
                        "MP3/OGG/... need an audio library not present "
                        "here; fixtures use FAKEAUD bytes")
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
    of a video training pipeline.

    Real path: YUV4MPEG2 mono streams via decode_y4m (container fps
    and dimensions win over table metadata). Fake path: FAKEVID prefix
    -> deterministic frames from the md5 digest + frame index. Either
    way one input row fans out to n_frames/every_nth rows inside the
    Arrow kernel, so raw frames never exist as Spark rows."""
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
                if content.startswith(b"YUV4MPEG2"):
                    real_fps, frames = decode_y4m(content)
                    for f_idx in range(0, len(frames), every_nth):
                        gray = frames[f_idx].astype(np.float64) / 255.0
                        rows.append({
                            "media_id": row["media_id"],
                            "frame_idx": f_idx,
                            "t_sec": f_idx / real_fps,
                            "feature": _mean_pool(gray, pool)
                            .ravel().tolist(),
                        })
                    continue
                if not content.startswith(b"FAKEVID"):
                    raise NotImplementedError(
                        "only YUV4MPEG2 (mono) decodes natively; "
                        "MP4/WebM need a video library not present "
                        "here; fixtures use FAKEVID bytes")
                w = _dim(row["width"], 16)
                h = _dim(row["height"], 12)
                n_frames = int(fps * _secs(row["duration_s"]))
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


def encode_bmp(img: np.ndarray) -> bytes:
    """Uncompressed 24-bit Windows BMP encoder (public format):
    BITMAPFILEHEADER + BITMAPINFOHEADER, BGR byte order, bottom-up
    rows, each row padded to a 4-byte boundary."""

    h, w, c = img.shape
    assert c == 3
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    off = 14 + 40
    file_header = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              data_size, 2835, 2835, 0, 0)
    img = np.asarray(img, dtype=np.uint8)
    rows = []
    for y in range(h - 1, -1, -1):        # bottom-up storage
        row = img[y][:, ::-1].tobytes()   # RGB -> BGR
        rows.append(row + b"\x00" * (row_size - len(row)))
    return file_header + info_header + b"".join(rows)


def decode_bmp(content: bytes) -> np.ndarray:
    """Real BMP parser for the uncompressed 24-bit DIB case: validates
    the 'BM' magic and BITMAPINFOHEADER, honors the pixel-array
    offset, row padding, and both bottom-up (height > 0) and top-down
    (height < 0) layouts. Returns (h, w, 3) uint8 RGB. Raises
    ValueError on malformed input and NotImplementedError for
    palettized / compressed / non-24bpp variants."""

    if content[:2] != b"BM":
        raise ValueError("not a BMP file (missing BM magic)")
    if len(content) < 54:
        raise ValueError("truncated BMP header")
    _, _, _, off = struct.unpack_from("<IHHI", content, 2)
    hsz, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", content, 14)
    if hsz < 40:
        raise ValueError(f"unsupported DIB header size {hsz}")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={comp})")
    if w <= 0 or h == 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    if off < 14 + hsz:
        raise ValueError(
            f"BMP pixel-array offset {off} points inside the header "
            f"(ends at {14 + hsz})")
    top_down = h < 0
    height = abs(h)
    row_size = (w * 3 + 3) & ~3
    need = row_size * height
    if len(content) < off + need:
        raise ValueError(
            f"BMP pixel array truncated: {len(content) - off} < {need}")
    arr = np.frombuffer(content, np.uint8, need, off).reshape(
        height, row_size)
    px = arr[:, :w * 3].reshape(height, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        px = px[::-1]
    return px.copy()
