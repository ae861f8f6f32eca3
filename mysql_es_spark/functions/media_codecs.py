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


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU T.81) + MJPEG, pure numpy — no codec libraries.
#
# The encoder emits standard baseline JFIF streams: SOI, DQT, SOF0, DHT,
# SOS, entropy-coded 4:4:4 MCUs, EOI. Huffman tables are simple canonical
# fixed-length tables (DC: 12 symbols at 4 bits; AC: 162 symbols at 8
# bits) CARRIED IN THE DHT SEGMENT — any conforming decoder reads its
# tables from the stream, so compatibility does not depend on the Annex K
# defaults (they are only a compression optimization). The decoder is a
# GENERAL baseline-sequential decoder (arbitrary Huffman tables from DHT,
# any quant tables, 1-4 components) restricted to 8-bit, single-scan,
# sampling factors 1x1 (all this encoder produces).
#
# MJPEG here is the standard "concatenated JPEG frames" stream (the
# payload format of MJPEG AVIs / multipart streams) — the container-free
# video format this engine can decode without a demuxer. mp4/h264 stays
# out of scope by disposition (needs PyAV; see operators/multimodal.py).
# ---------------------------------------------------------------------------

_QY = np.array(  # T.81 Annex K.1 luminance quantization (public constants)
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int64,
).reshape(8, 8)
_QC = np.array(  # Annex K.2 chrominance
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64,
).reshape(8, 8)


def _zigzag_order() -> np.ndarray:
    """(row, col) visit order of the standard zigzag scan, as flat indices."""
    cells = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(7, s) + 1)]
        cells.extend(diag[::-1] if s % 2 == 0 else diag)
    return np.array([r * 8 + c for r, c in cells], dtype=np.int64)


_ZIG = _zigzag_order()


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    m = np.sqrt(2.0 / 8.0) * np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0)
    m[0] /= np.sqrt(2.0)
    return m


_DCT = _dct_matrix()

# encoder Huffman tables: canonical, fixed-length, all-ones code unused
_DC_SYMS = list(range(12))                       # 12 categories, 4 bits each
_AC_SYMS = [0x00, 0xF0] + [                      # EOB, ZRL, then (run,size)
    (r << 4) | s for r in range(16) for s in range(1, 11)
]                                                # 162 symbols, 8 bits each


def _dht_payload(tc: int, th: int, lengths: list[int], syms: list[int]) -> bytes:
    bits = [0] * 16
    for ln in lengths:
        bits[ln - 1] += 1
    return bytes([tc << 4 | th] + bits + syms)


def _canonical_codes(bits: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """DHT bits/vals → {symbol: (code, length)} (T.81 C.2 canonical order)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[syms[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = _canonical_codes(
    [0, 0, 0, 12] + [0] * 12, _DC_SYMS
)
_ENC_AC = _canonical_codes(
    [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8, _AC_SYMS
)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-pad
        return bytes(self.out)


def _scale_quant(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_component(bw: _BitWriter, blocks: np.ndarray, q: np.ndarray, dc_prev: int) -> int:
    """blocks (n, 8, 8) float, already level-shifted; returns new DC pred."""
    coeffs = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    quant = np.round(coeffs / q).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, _ZIG]
    for row in zz:
        diff = int(row[0]) - dc_prev
        dc_prev = int(row[0])
        t = int(abs(diff)).bit_length()
        code, ln = _ENC_DC[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        nz = np.flatnonzero(row[1:])
        k = 0
        for idx in nz:
            run = int(idx) - k
            while run > 15:
                c, l = _ENC_AC[0xF0]
                bw.write(c, l)
                run -= 16
            v = int(row[1 + idx])
            s = int(abs(v)).bit_length()
            c, l = _ENC_AC[(run << 4) | s]
            bw.write(c, l)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            k = int(idx) + 1
        if k < 63:
            c, l = _ENC_AC[0x00]
            bw.write(c, l)
    return dc_prev


def encode_jpeg(pixels: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (h, w, 3) RGB → baseline JFIF 4:4:4 JPEG bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_jpeg expects (h, w, 3) RGB")
    h, w, _ = px.shape
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qy, qc = _scale_quant(_QY, quality), _scale_quant(_QC, quality)

    ph, pw = -h % 8, -w % 8  # edge-replicate to 8x8 multiples
    planes = [
        np.pad(c, ((0, ph), (0, pw)), mode="edge") - 128.0 for c in (y, cb, cr)
    ]
    nby, nbx = planes[0].shape[0] // 8, planes[0].shape[1] // 8

    def blockify(p: np.ndarray) -> np.ndarray:
        return p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)

    blks = [blockify(p) for p in planes]

    head = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        head.extend(bytes([0xFF, marker]))
        head.extend((len(payload) + 2).to_bytes(2, "big"))
        head.extend(payload)

    seg(0xDB, bytes([0]) + bytes(qy.reshape(-1)[_ZIG].tolist()))  # DQT 0
    seg(0xDB, bytes([1]) + bytes(qc.reshape(-1)[_ZIG].tolist()))  # DQT 1
    sof = bytearray([8])
    sof.extend(h.to_bytes(2, "big") + w.to_bytes(2, "big"))
    sof.append(3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof.extend([cid, 0x11, tq])  # 1x1 sampling
    seg(0xC0, bytes(sof))  # SOF0 baseline
    seg(0xC4, _dht_payload(0, 0, [4] * 12, _DC_SYMS))
    seg(0xC4, _dht_payload(1, 0, [8] * 162, _AC_SYMS))
    sos = bytearray([3])
    for cid in (1, 2, 3):
        sos.extend([cid, 0x00])  # DC table 0, AC table 0
    sos.extend([0, 63, 0])
    seg(0xDA, bytes(sos))

    # interleaved MCU order: for each MCU, one block per component —
    # with 1x1 sampling MCU (i) maps to block index i of every plane
    bw = _BitWriter()
    preds = [0, 0, 0]
    qs = [qy, qc, qc]
    for i in range(nby * nbx):
        for c in range(3):
            preds[c] = _encode_component(bw, blks[c][i : i + 1], qs[c], preds[c])
    return bytes(head) + bw.flush() + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes) -> None:
        # un-stuff 0xFF00 → 0xFF once, then serve bits
        raw = np.frombuffer(data, dtype=np.uint8)
        keep = np.ones(len(raw), dtype=bool)
        ff = np.flatnonzero(raw[:-1] == 0xFF)
        keep[ff[raw[ff + 1] == 0x00] + 1] = False
        self.bits = np.unpackbits(raw[keep])
        self.pos = 0

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        for _ in range(n):
            v = (v << 1) | int(self.bits[self.pos])
            self.pos += 1
        return v


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Baseline JPEG → ((h, w, 3) uint8 RGB or (h, w, 1) gray, end offset).

    General baseline-sequential: Huffman + quant tables from the stream,
    single scan, 8-bit, sampling factors 1x1."""
    data = payload
    i = offset
    if data[i : i + 2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    i += 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scomp: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    h = w = 0
    while True:
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI with no scan
            raise ValueError("no scan data before EOI")
        ln = int.from_bytes(data[i : i + 2], "big")
        seg = data[i + 2 : i + ln]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIG] = np.frombuffer(seg, dtype=np.uint8, count=64, offset=j + 1)
                qt[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                syms = list(seg[j + 17 : j + 17 + n])
                codes = _canonical_codes(bits, syms)
                huff[(tc, th)] = {(l, c): s for s, (c, l) in codes.items()}
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("only 1x1 sampling supported")
                comps.append((cid, tq))
        elif marker in (0xC2, 0xC3) or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDA:
            ns = seg[0]
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                idx = next(k for k, (cid, _) in enumerate(comps) if cid == cs)
                scomp.append((idx, tt >> 4, tt & 15))
            i += ln
            break
        i += ln

    # entropy-coded data runs to the next real marker (stuffed FF00 skipped)
    j = i
    while True:
        j = data.index(b"\xff", j)
        if data[j + 1] == 0x00:
            j += 2
            continue
        if 0xD0 <= data[j + 1] <= 0xD7:  # restart markers unsupported, but skip
            raise ValueError("restart intervals not supported")
        break
    br = _BitReader(data[i:j])
    end = j + 2 if data[j + 1] == 0xD9 else j

    def read_sym(tbl: dict) -> int:
        code, lnn = 0, 0
        while True:
            code = (code << 1) | br.read_bit()
            lnn += 1
            s = tbl.get((lnn, code))
            if s is not None:
                return s
            if lnn > 16:
                raise ValueError("invalid Huffman stream")

    nby, nbx = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((nby * 8, nbx * 8), dtype=np.float64) for _ in scomp]
    preds = [0] * len(scomp)
    for m in range(nby * nbx):
        by, bx = divmod(m, nbx)
        for s_i, (ci, tdc, tac) in enumerate(scomp):
            t = read_sym(huff[(0, tdc)])
            diff = _extend(br.read(t), t) if t else 0
            preds[s_i] += diff
            zz = np.zeros(64, dtype=np.int64)
            zz[0] = preds[s_i]
            k = 1
            while k < 64:
                sym = read_sym(huff[(1, tac)])
                if sym == 0x00:
                    break
                if sym == 0xF0:
                    k += 16
                    continue
                k += sym >> 4
                size = sym & 15
                zz[k] = _extend(br.read(size), size)
                k += 1
            blk = np.zeros(64, dtype=np.float64)
            blk[_ZIG] = zz * qt[comps[ci][1]].reshape(-1)[_ZIG]
            b8 = blk.reshape(8, 8)
            px = _DCT.T @ b8 @ _DCT + 128.0
            planes[s_i][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px

    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        out = np.clip(planes[0], 0, 255).astype(np.uint8)[..., None]
        return out, end
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    return rgb, end


JPEG_SIG = b"\xff\xd8"


def encode_mjpeg(frames: list[np.ndarray], quality: int = 85) -> bytes:
    """Concatenated-JPEG MJPEG stream (the MJPEG-AVI payload format)."""
    if not frames:
        raise ValueError("MJPEG needs at least one frame")
    return b"".join(encode_jpeg(f, quality) for f in frames)


def decode_mjpeg(payload: bytes) -> list[np.ndarray]:
    """MJPEG stream → list of decoded frames (each (h, w, 3) uint8)."""
    frames, off = [], 0
    while off < len(payload) and payload[off : off + 2] == JPEG_SIG:
        px, off = decode_jpeg(payload, off)
        frames.append(px)
    if not frames:
        raise ValueError("no JPEG frames in payload")
    return frames
