"""Multimodal columns: opaque binary payloads + typed metadata, with REAL
pure-numpy decoders for uncompressed container formats.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
functions over ``mapInPandas`` (≙ the reference's payload-touching
transforms, internal/contract/contract_data.go:72-160, which decode opaque
XDR blobs into typed records — same shape: bytes in, structured values out).

No imaging/audio libraries ship in this environment, so the decoders are
written against the container specs directly (numpy only):

- images: binary PPM (``P6``) — the portable-pixmap format: ASCII header
  ``P6 <w> <h> <maxval>`` then raw RGB bytes.
- audio: canonical RIFF/WAVE PCM16 mono — 44-byte header, little-endian
  int16 samples.
- video: a trivial raw container (magic ``RVID``, uint32 n_frames/w/h,
  then n_frames raw RGB frames) — enough to make frame sampling a real
  decode rather than a plan-only fan-out.

Unknown payload formats raise ``ValueError`` (the analog of the
reference's unknown-change-type error, internal/contract/utils.go:22-24).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),     # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("mime", T.StringType(), True),
    ]), True),
])


# ------------------------------------------------------------ codecs (numpy)
def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Pure numpy + header parse."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 ASCII ints separated by whitespace, then ONE
    # whitespace byte before the raster
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":           # comment line
            while i < len(data) and data[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float [-1, 1] or int16 mono samples → canonical 44-byte-header WAV."""
    if samples.dtype != np.int16:
        samples = (np.clip(samples, -1.0, 1.0) * 32767.0).astype(np.int16)
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data))
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono → (float32 samples in [-1, 1], sample_rate).
    Walks the chunk list (fmt may not be first in arbitrary producers)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, raw = 12, None, None
    while i + 8 <= len(data):
        cid, size = data[i:i + 4], struct.unpack_from("<I", data, i + 4)[0]
        body = data[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            raw = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    return samples, rate


RVID_MAGIC = b"RVID"


def encode_rvid(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 → raw-video container."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return RVID_MAGIC + struct.pack("<III", n, w, h) + frames.tobytes()


def decode_rvid(data: bytes,
                frame_indices: list[int] | None = None) -> np.ndarray:
    """Raw-video container → (k, h, w, 3) uint8. ``frame_indices`` decodes
    only the sampled frames (offset arithmetic — no full-payload scan)."""
    if data[:4] != RVID_MAGIC:
        raise ValueError("not an RVID payload")
    n, w, h = struct.unpack_from("<III", data, 4)
    fsize = w * h * 3
    idx = list(range(n)) if frame_indices is None else frame_indices
    out = np.empty((len(idx), h, w, 3), dtype=np.uint8)
    for k, fi in enumerate(idx):
        if not 0 <= fi < n:
            raise ValueError(f"frame {fi} out of range 0..{n - 1}")
        off = 16 + fi * fsize
        out[k] = np.frombuffer(data, np.uint8, fsize, off).reshape(h, w, 3)
    return out


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes; ValueError on unknown formats."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise ValueError(f"unknown image format (magic {payload[:2]!r})")


# ------------------------------------------------------- synthetic corpus
def _rng_for(seed: int, i: int) -> np.random.RandomState:
    return np.random.RandomState((seed * 1_000_003 + i) % (2 ** 31 - 1))


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL encoded payloads: PPM images
    (gradient + seeded noise), PCM16 WAV tones, RVID clips."""
    rows = []
    for i in range(n):
        rng = _rng_for(seed, i)
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 64 + i % 32, 64 + (i * 7) % 32
            grad = np.linspace(0, 255, w, dtype=np.float32)
            img = np.stack([np.tile(grad, (h, 1))] * 3, axis=-1)
            img = np.clip(img + rng.randn(h, w, 3) * 12, 0, 255).astype(np.uint8)
            rows.append((i, kind, encode_ppm(img),
                         (w, h, None, None, "image/x-portable-pixmap")))
        elif kind == "audio":
            rate, dur = 16000, 0.05
            t = np.arange(int(rate * dur)) / rate
            f0 = 220.0 * (1 + (i % 12))
            sig = (0.6 * np.sin(2 * np.pi * f0 * t)
                   + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
                   + 0.05 * rng.randn(t.size))
            rows.append((i, kind, encode_wav_pcm16(sig, rate),
                         (None, None, rate, None, "audio/wav")))
        else:
            nf, w, h = 24 + i % 10, 16, 12
            base = rng.randint(0, 255, size=(h, w, 3)).astype(np.float32)
            drift = rng.randn(h, w, 3) * 4
            frames = np.clip(
                base[None] + drift[None] * np.arange(nf)[:, None, None, None],
                0, 255).astype(np.uint8)
            rows.append((i, kind, encode_rvid(frames),
                         (w, h, None, nf, "video/x-raw")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ------------------------------------------------------ feature extraction
def _image_features(img: np.ndarray, dim: int) -> list[float]:
    """Channel means/stds + a 2×2 spatial grid of luma means, padded/cut
    to ``dim`` — cheap, deterministic, resolution-independent."""
    f = img.astype(np.float32) / 255.0
    feats = list(f.mean(axis=(0, 1))) + list(f.std(axis=(0, 1)))
    luma = f.mean(axis=2)
    h, w = luma.shape
    for gy in range(2):
        for gx in range(2):
            feats.append(float(luma[gy * h // 2:(gy + 1) * h // 2,
                                    gx * w // 2:(gx + 1) * w // 2].mean()))
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


def _audio_features(samples: np.ndarray, rate: int, dim: int) -> list[float]:
    """RMS + zero-crossing rate + leading FFT magnitudes."""
    rms = float(np.sqrt(np.mean(samples ** 2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples))).astype(np.float32)))
    mags = np.abs(np.fft.rfft(samples))[:max(dim - 2, 0)]
    mags = mags / (np.max(mags) + 1e-9)
    feats = [rms, zcr] + [float(x) for x in mags]
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


def extract_features(media: DataFrame, dim: int = 32,
                     frame_every_n: int = 8) -> DataFrame:
    """mapInPandas feature extraction: payload → float vector via the REAL
    decoders. Batched Arrow transfer; per-batch numpy; videos decode only
    every ``frame_every_n``-th frame (offset-seek, not full scan) and
    average the per-frame image features."""
    out_schema = "media_id long, kind string, feature array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                if p is None:
                    feats.append(None)
                    continue
                p = bytes(p)
                if kind == "image":
                    feats.append(_image_features(decode_image(p), dim))
                elif kind == "audio":
                    samples, rate = decode_wav(p)
                    feats.append(_audio_features(samples, rate, dim))
                elif kind == "video":
                    nf = struct.unpack_from("<I", p, 4)[0]
                    idx = list(range(0, nf, frame_every_n))
                    frames = decode_rvid(p, idx)
                    per = np.array([_image_features(fr, dim) for fr in frames],
                                   dtype=np.float32)
                    feats.append([float(x) for x in per.mean(axis=0)])
                else:
                    raise ValueError(f"unknown media kind {kind!r}")
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"], "feature": feats})

    return media.mapInPandas(fn, out_schema)


def frame_sample_plan(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame index
    (JVM explode over a sequence; extract_features performs the actual
    offset-seek decode of exactly these indices)."""
    v = media.filter(F.col("kind") == "video")
    frames = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    return v.select("media_id", F.explode(frames).alias("frame_idx"))


def resize_image(img: np.ndarray, max_side: int = 32) -> np.ndarray:
    """Aspect-preserving nearest-neighbor downscale — pure numpy index
    arithmetic (the pixel half of resize_meta's planning)."""
    h, w = img.shape[:2]
    scale = min(max_side / w, max_side / h, 1.0)
    tw, th = max(int(w * scale), 1), max(int(h * scale), 1)
    yi = (np.arange(th) * (h / th)).astype(np.int64)
    xi = (np.arange(tw) * (w / tw)).astype(np.int64)
    return img[yi][:, xi]


def resize_meta(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning for images: target dims preserving aspect ratio —
    pure JVM arithmetic on metadata (resize_image does the pixel work)."""
    i = media.filter(F.col("kind") == "image")
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return i.select("media_id",
                    F.floor(w * scale).cast("int").alias("target_w"),
                    F.floor(h * scale).cast("int").alias("target_h"))
