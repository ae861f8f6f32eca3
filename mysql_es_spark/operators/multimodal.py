"""Multimodal columns — binary payloads with typed metadata.

Treats image/audio/video as opaque ``binary`` columns plus a typed
metadata struct, with decode / feature-extract / resize / frame-sample as
Arrow-batched operators over ``mapInPandas``. The image/audio codec
libraries are NOT in this container, so the *decode step itself* is
stubbed: ``real=True`` raises ``NotImplementedError`` with the intended
implementation documented, and the default is a deterministic fake decode
(seeded from the payload bytes) — the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, format:string, duration_s:double>"
)
KINDS = ["image", "audio", "video"]
FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id."""
    rows = []
    for i in range(n):
        kind = KINDS[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 8)
        meta = (
            64 + (i % 4) * 32 if kind == "image" else None,
            48 + (i % 4) * 24 if kind == "image" else None,
            FORMATS[kind],
            float(2 + i % 30) if kind in ("audio", "video") else None,
        )
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: pseudo-features seeded
    from the payload digest. Replace with PIL/librosa/PyAV when available."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 32, real: bool = False
) -> DataFrame:
    """(media_id, kind, n_bytes, feature array<float>) via mapInPandas.

    Arrow batches of binary payloads in; fixed-width feature vectors out.
    The decode is per-payload Python (unavoidable for codec calls — the
    real implementation would call into a C decoder per element exactly
    the same way); everything around it is vectorized and distributed."""
    if real:
        raise NotImplementedError(
            "real decode requires PIL/librosa/PyAV (not in this image); "
            "wire the codec call into _fake_decode's slot"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(p), dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, kind string, n_bytes long, feature array<float>"
    )


def frame_sample(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """(media_id, frame_idx, frame_ts) — one row per sampled video frame.

    Pure JVM explode over the metadata (no decode): the downstream decode
    of individual frames would join this against the payload column."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.floor(F.col("meta.duration_s") * F.lit(fps)).cast("int"))
        ).alias("frame_idx"),
    ).withColumn("frame_ts", F.col("frame_idx") / F.lit(fps))


def resize_plan(media: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-level resize plan (real pixel work lives in the decode
    stub): emits target geometry + scale factors, validating the schema
    plumbing end-to-end."""
    img = media.filter(F.col("kind") == "image")
    return img.select(
        "media_id",
        F.col("meta.width").alias("src_w"),
        F.col("meta.height").alias("src_h"),
        F.lit(width).alias("dst_w"),
        F.lit(height).alias("dst_h"),
        F.round(F.lit(width) / F.col("meta.width"), 4).alias("scale_x"),
        F.round(F.lit(height) / F.col("meta.height"), 4).alias("scale_y"),
    )
