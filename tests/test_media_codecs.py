"""Pure-Python media codecs (functions/media_codecs.py) — roundtrips and
PNG scanline-filter reconstruction against spec-computed fixtures. No
Spark session needed."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from mysql_es_spark.functions import media_codecs as mc


def test_wav_roundtrip():
    rng = np.random.default_rng(7)
    x = np.clip(0.4 * np.sin(np.linspace(0, 60, 4000)) + 0.1 * rng.standard_normal(4000), -1, 1)
    payload = mc.encode_wav(x, rate=8000)
    y, rate, ch = mc.decode_wav(payload)
    assert (rate, ch) == (8000, 1) and y.shape == (4000, 1)
    assert np.allclose(y[:, 0], x, atol=2 / 32767)


def test_wav_stereo():
    x = np.stack([np.linspace(-1, 1, 100), np.linspace(1, -1, 100)], axis=1)
    y, rate, ch = mc.decode_wav(mc.encode_wav(x.ravel(), rate=4000, channels=2))
    assert ch == 2 and y.shape == (100, 2)
    assert np.allclose(y, x, atol=2 / 32767)


@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 3), (5, 7, 4)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    out = mc.decode_png(mc.encode_png(px))
    want = px if px.ndim == 3 else px[:, :, None]
    assert np.array_equal(out, want)


def _filter_row(f, line, prev, ch):
    """Apply a PNG filter (spec §6, encoder direction) to one scanline."""
    n = len(line)
    out = np.zeros(n, dtype=np.uint8)
    for x in range(n):
        a = int(line[x - ch]) if x >= ch else 0
        b = int(prev[x])
        c = int(prev[x - ch]) if x >= ch else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[x] = (int(line[x]) - pred) & 0xFF
    return out


def test_png_all_filters_reconstruct():
    """Hand-build a PNG whose 5 scanlines use filters 0..4; decode must
    recover the original pixels exactly."""
    rng = np.random.default_rng(3)
    h, w, ch = 5, 6, 3
    px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    flat = px.reshape(h, w * ch)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        raw.append(y)  # filter type = row index: exercises 0,1,2,3,4
        raw.extend(_filter_row(y, flat[y], prev, ch).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(kind, data):
        return (
            struct.pack(">I", len(data)) + kind + data
            + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF)
        )

    payload = (
        mc.PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(mc.decode_png(payload), px)


def test_ppm_roundtrip_and_comment():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (4, 9, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(px)), px)
    # header comments are legal PPM
    commented = b"P6\n# a comment\n9 4\n255\n" + px.tobytes()
    assert np.array_equal(mc.decode_ppm(commented), px)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        mc.decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        mc.decode_ppm(b"P3\n1 1\n255\n0 0 0")


# --- baseline JPEG / MJPEG (pure numpy) ---


def _grad_noise(h, w, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
            rng.integers(0, 256, (h, w), dtype=np.uint8),
        ],
        axis=-1,
    )


def _psnr(a, b):
    err = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(255**2 / max((err**2).mean(), 1e-9))


def test_jpeg_roundtrip_dims_and_psnr():
    for h, w in [(8, 8), (17, 23), (48, 64)]:
        px = _grad_noise(h, w, seed=h * 100 + w)
        blob = mc.encode_jpeg(px, quality=90)
        dec, end = mc.decode_jpeg(blob)
        assert end == len(blob)
        assert dec.shape == px.shape
        assert _psnr(dec, px) > 25  # noisy channel bounds quality


def test_jpeg_smooth_near_lossless():
    yy, xx = np.mgrid[0:40, 0:40]
    smooth = np.stack([((xx + yy) * 3 % 256).astype(np.uint8)] * 3, axis=-1)
    dec, _ = mc.decode_jpeg(mc.encode_jpeg(smooth, quality=95))
    assert int(np.abs(dec.astype(int) - smooth.astype(int)).max()) <= 2


def test_jpeg_quality_monotone_size():
    px = _grad_noise(32, 32)
    sizes = [len(mc.encode_jpeg(px, quality=q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)


def test_jpeg_deterministic():
    px = _grad_noise(24, 24)
    assert mc.encode_jpeg(px, 85) == mc.encode_jpeg(px, 85)


def test_jpeg_rejects_garbage():
    with pytest.raises(ValueError):
        mc.decode_jpeg(b"not a jpeg")


def test_mjpeg_roundtrip():
    frames = [_grad_noise(24, 32, seed=i) for i in range(5)]
    stream = mc.encode_mjpeg(frames, quality=85)
    out = mc.decode_mjpeg(stream)
    assert len(out) == 5
    for f, o in zip(frames, out):
        assert o.shape == f.shape
        assert _psnr(o, f) > 25


def test_mjpeg_empty_rejected():
    with pytest.raises(ValueError):
        mc.encode_mjpeg([])
    with pytest.raises(ValueError):
        mc.decode_mjpeg(b"\x00\x01")
