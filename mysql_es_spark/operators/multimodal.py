"""Multimodal columns — binary payloads with typed metadata.

Treats image/audio/video as ``binary`` columns plus a typed metadata
struct, with decode / feature-extract / resize / frame-sample as
Arrow-batched operators over ``mapInPandas``. Image and audio decode is
REAL, with zero external codec libraries: WAV via stdlib ``wave``, PNG
via ``zlib`` + scanline-filter reconstruction, PPM P6 by header parse
(functions/media_codecs.py) — ``extract_features(real=True)`` computes
features from actual samples/pixels. Video (mp4) decode would need a
container demuxer (PyAV, not in this image) and remains a documented
stub: real mode raises on video rows by default (``on_video="error"``)
or falls back to the digest features (``on_video="fake"``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import media_codecs as mc

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, format:string, duration_s:double>"
)
KINDS = ["image", "audio", "video"]


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads: images are valid
    PNG (every third image PPM), audio is valid 16-bit PCM WAV; video
    stays an opaque digest payload (no encoder without PyAV)."""
    rows = []
    for i in range(n):
        kind = KINDS[i % 3]
        rng = np.random.default_rng(seed * 100003 + i)
        if kind == "image":
            w, h = 64 + (i % 4) * 32, 48 + (i % 4) * 24
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                    (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                    rng.integers(0, 256, (h, w), dtype=np.uint8),
                ],
                axis=-1,
            )
            fmt = "ppm" if (i // 3) % 3 == 2 else "png"
            payload = mc.encode_ppm(px) if fmt == "ppm" else mc.encode_png(px)
            meta = (w, h, fmt, None)
        elif kind == "audio":
            dur, rate = float(2 + i % 30), 1600
            t = np.arange(int(dur * rate)) / rate
            freq = 55.0 * (1 + i % 8)
            samples = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(
                len(t)
            )
            payload = mc.encode_wav(samples, rate=rate)
            meta = (None, None, "wav", dur)
        else:
            payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 8)
            meta = (None, None, "mp4", float(2 + i % 30))
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: pseudo-features seeded
    from the payload digest. Replace with PIL/librosa/PyAV when available."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(dim).astype(np.float32)


def _image_features(px: np.ndarray, dim: int) -> np.ndarray:
    """Pixels (h, w, ch) uint8 → dim-wide deterministic features:
    [w, h, ch, mean, std] + a nearest-neighbor gray thumbnail."""
    h, w, ch = px.shape
    gray = px.astype(np.float64).mean(axis=2) / 255.0
    head = [w / 1e3, h / 1e3, float(ch), float(gray.mean()), float(gray.std())]
    k = max(dim - len(head), 0)
    side = max(int(np.ceil(np.sqrt(k))), 1)
    ys = np.linspace(0, h - 1, side).astype(int)
    xs = np.linspace(0, w - 1, side).astype(int)
    thumb = gray[np.ix_(ys, xs)].ravel()[:k]
    out = np.array(head + list(thumb), dtype=np.float32)
    return np.pad(out, (0, dim - len(out)))[:dim]


def _audio_features(x: np.ndarray, rate: int, channels: int, dim: int) -> np.ndarray:
    """Samples (n, ch) in [-1,1] → [duration, rate, ch, rms, zcr] +
    log-energy over linear frequency bands (numpy rFFT)."""
    mono = x.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt((mono**2).mean())) if n else 0.0
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
    head = [n / rate, rate / 1e5, float(channels), rms, zcr]
    k = max(dim - len(head), 0)
    if k and n:
        spec = np.abs(np.fft.rfft(mono))
        bands = [
            float(np.log1p(b.mean())) if len(b) else 0.0
            for b in np.array_split(spec, k)
        ]
    else:
        bands = []
    out = np.array(head + bands, dtype=np.float32)
    return np.pad(out, (0, dim - len(out)))[:dim]


def _real_decode(payload: bytes, kind: str, dim: int, on_video: str) -> np.ndarray:
    if kind == "image":
        if payload[:8] == mc.PNG_SIG:
            return _image_features(mc.decode_png(payload), dim)
        if payload[:2] == b"P6":
            return _image_features(mc.decode_ppm(payload), dim)
        raise ValueError("image payload is neither PNG nor PPM")
    if kind == "audio":
        return _audio_features(*mc.decode_wav(payload), dim)
    if on_video == "fake":
        return _fake_decode(payload, dim)
    raise NotImplementedError(
        "video decode requires a container demuxer (PyAV, not in this "
        "image); pass on_video='fake' to keep digest features for video rows"
    )


def extract_features(
    media: DataFrame, dim: int = 32, real: bool = False, on_video: str = "error"
) -> DataFrame:
    """(media_id, kind, n_bytes, feature array<float>) via mapInPandas.

    Arrow batches of binary payloads in; fixed-width feature vectors out.
    ``real=True`` decodes actual pixels/samples (WAV/PNG/PPM,
    functions/media_codecs.py) — per-payload Python is inherent to codec
    work (a C decoder call sits in the same slot); everything around it is
    vectorized and distributed. ``real=False`` keeps the cheap digest
    features for plumbing tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                feats = [
                    _real_decode(bytes(p), k, dim, on_video)
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ]
            else:
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
