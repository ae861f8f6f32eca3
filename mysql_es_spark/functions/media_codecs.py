"""Pure-Python/numpy media codecs — no external image/audio libraries.

Real decoders for the three formats the multimodal operators ship with
real payloads for: WAV (stdlib ``wave``), PNG (``zlib`` + scanline
filter reconstruction per the PNG spec), and PPM P6 (plain header +
raw RGB). Encoders exist so the synthetic media table and the tests can
fabricate real payloads deterministically. Video (mp4) stays a
documented stub in operators/multimodal.py — a container demuxer is out
of scope without PyAV.

These run inside Arrow-batched ``mapInPandas`` workers: per-payload
Python is inherent to codec work (a PIL/libsndfile call sits in exactly
the same slot); everything around the decode stays vectorized numpy.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
# colortype -> channel count (8-bit, non-interlaced support)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------- WAV ----
def encode_wav(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    """float samples in [-1, 1] -> 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes -> (float samples in [-1, 1] shaped (n, channels), rate,
    channels). 16-bit and 8-bit PCM."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        channels, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, channels), rate, channels


# ---------------------------------------------------------------- PNG ----
def _chunk(kind: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + kind
        + data
        + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w) gray, (h, w, 3) RGB, or (h, w, 4) RGBA -> PNG."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, w * ch)], axis=1
    ).tobytes()
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 pixel array (h, w, channels). Supports 8-bit
    depth, colortypes gray/gray+alpha/RGB/RGBA, non-interlaced; all five
    scanline filters are reconstructed (spec §6: None/Sub/Up/Avg/Paeth)."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        kind = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if kind == b"IHDR":
            w, h, depth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or colortype not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth} colortype={colortype} "
                    f"interlace={interlace})"
                )
            meta = (w, h, _PNG_CHANNELS[colortype])
        elif kind == b"IDAT":
            idat.append(data)
        elif kind == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, line = rows[y, 0], rows[y, 1:].copy()
        prev = out[y - 1] if y else zero
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + left) & 0xFF
            out[y] = line
        elif f == 2:  # Up
            out[y] = (line.astype(np.int16) + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
            out[y] = line
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else np.uint8(0)
                c = prev[x - ch] if x >= ch else np.uint8(0)
                line[x] = (int(line[x]) + int(_paeth(a, prev[x], c))) & 0xFF
            out[y] = line
        else:
            raise ValueError(f"unknown PNG filter {f}")
    return out.reshape(h, w, ch)


# ---------------------------------------------------------------- PPM ----
def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> binary PPM (P6)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch != 3:
        raise ValueError("PPM is RGB")
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> uint8 (h, w, 3)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: three whitespace-separated fields after magic, then one
    # whitespace byte, then raw RGB
    fields, i = [], 2
    while len(fields) < 3:
        while payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i).reshape(
        h, w, 3
    )
