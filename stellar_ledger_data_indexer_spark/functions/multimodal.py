"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
functions over ``mapInPandas``. The decode step itself is STUBBED (no
imaging/audio libraries in this environment): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic hash-derived feature vector stands in — the Spark-side
plumbing (schema, batching, partition flow) is real and tested either
way.
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


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        kind = ["image", "audio", "video"][i % 3]
        meta = (64 + i % 32, 64 + (i * 7) % 32, None, None, "image/fake") \
            if kind == "image" else \
            (None, None, 16000, None, "audio/fake") if kind == "audio" else \
            (None, None, None, 24 + i % 10, "video/fake")
        rows.append((i, kind, h * 8, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs an imaging library not present here."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library (PIL/cv2) — not "
            "available in this environment; pass fake=True for the "
            "deterministic stand-in")
    h = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
    return (h.astype("float32") / 255.0)


def extract_features(media: DataFrame, dim: int = 32,
                     fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: payload → float vector. Batched
    Arrow transfer; per-batch numpy; the decode call is the stub."""
    out_schema = "media_id long, kind string, feature array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                else:
                    v = decode_image(bytes(p), fake=fake)
                    feats.append(v[:dim].tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"], "feature": feats})

    return media.mapInPandas(fn, out_schema)


def frame_sample_plan(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index
    (JVM explode over a sequence — the real decode would run downstream).
    Demonstrates the fan-out shape without touching payload bytes."""
    v = media.filter(F.col("kind") == "video")
    frames = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    return v.select("media_id", F.explode(frames).alias("frame_idx"))


def resize_meta(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning for images: target dims preserving aspect ratio —
    pure JVM arithmetic on metadata (the pixel work is the stubbed
    decode's job)."""
    i = media.filter(F.col("kind") == "image")
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return i.select("media_id",
                    F.floor(w * scale).cast("int").alias("target_w"),
                    F.floor(h * scale).cast("int").alias("target_h"))
