"""Posting-block codec: delta-gap + frame-of-reference bit-packing.

The reference delegates posting storage entirely to Lucene (via ES bulk
writes, /root/reference/src/main/java/org/fly/sync/es/Writer.java:106-144);
we own it. Layout per block (≤ ``IndexConfig.block_size`` postings, docids
strictly ascending — the analog of the reference's physical index sort,
/root/reference/etc/template.json:3-5):

    header  : w_doc u8 | w_tf u8 | w_dl u8 | base_docid u64-le
    payload : bitpack(docid deltas, w_doc) ++ bitpack(tf, w_tf)
              ++ bitpack(dl, w_dl)

``bitpack(vals, w)`` stores each value in exactly ``w`` bits, big-endian
within the value, via numpy (vectorized encode *and* decode — no per-row
Python). w=0 ⇒ all values zero ⇒ zero payload bytes. Deltas are
``docid[i] - docid[i-1]`` with delta[0] = 0 (base carries the first docid),
i.e. PForDelta's FOR core without exceptions — head-term blocks of dense
consecutive docids pack to ~1 bit/posting.
"""

from __future__ import annotations

import numpy as np

_HEADER = 3 + 8


def pack_uint(vals: np.ndarray) -> tuple[int, bytes]:
    """Bit-pack non-negative ints; returns (width_bits, payload)."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    if len(vals) == 0:
        return 0, b""
    w = int(vals.max()).bit_length()
    if w == 0:
        return 0, b""
    shifts = np.arange(w - 1, -1, -1, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return w, np.packbits(bits.ravel()).tobytes()


def unpack_uint(buf: bytes | memoryview, w: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_uint` for n values of width w."""
    if w == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8, count=(n * w + 7) // 8)
    bits = np.unpackbits(raw, count=n * w).reshape(n, w).astype(np.uint64)
    weights = np.uint64(1) << np.arange(w - 1, -1, -1, dtype=np.uint64)
    return bits @ weights


def _packed_len(w: int, n: int) -> int:
    return (n * w + 7) // 8


def encode_block(docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    """Encode one posting block. docids must be sorted ascending."""
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    base = int(docids[0])
    deltas = np.empty(len(docids), dtype=np.uint64)
    deltas[0] = 0
    np.subtract(docids[1:], docids[:-1], out=deltas[1:], casting="unsafe")
    w_doc, b_doc = pack_uint(deltas)
    w_tf, b_tf = pack_uint(np.ascontiguousarray(tfs, dtype=np.uint64))
    w_dl, b_dl = pack_uint(np.ascontiguousarray(dls, dtype=np.uint64))
    header = bytes((w_doc, w_tf, w_dl)) + base.to_bytes(8, "little")
    return header + b_doc + b_tf + b_dl


def decode_block(blob: bytes, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block → (docids int64 asc, tfs int64, dls int64)."""
    mv = memoryview(blob)
    w_doc, w_tf, w_dl = mv[0], mv[1], mv[2]
    base = int.from_bytes(mv[3:11], "little")
    off = _HEADER
    deltas = unpack_uint(mv[off:], w_doc, n)
    off += _packed_len(w_doc, n)
    tfs = unpack_uint(mv[off:], w_tf, n)
    off += _packed_len(w_tf, n)
    dls = unpack_uint(mv[off:], w_dl, n)
    docids = base + np.cumsum(deltas, dtype=np.int64)
    return docids, tfs.astype(np.int64), dls.astype(np.int64)


def encode_positions(positions: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode per-posting token positions (phrase-query payload).

    ``positions`` is the concatenation, in posting (docid) order, of each
    posting's ascending position list; ``tfs`` gives the per-posting counts
    (the split points — stored once in the main block, not duplicated
    here). Within a posting the values are delta-gapped (first absolute),
    then the whole stream is FOR bit-packed: one byte of width header plus
    ~log2(max gap) bits per occurrence.
    """
    positions = np.ascontiguousarray(positions, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    if len(positions) == 0:
        return b"\x00"
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    deltas = np.empty(len(positions), dtype=np.uint64)
    np.subtract(positions[1:], positions[:-1], out=deltas[1:], casting="unsafe")
    deltas[starts] = positions[starts]
    w, payload = pack_uint(deltas)
    return bytes((w,)) + payload


def decode_positions(blob: bytes | memoryview, tfs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_positions` → flat int64 position array
    (segment boundaries are ``np.cumsum(tfs)``, as at encode time)."""
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = int(tfs.sum())
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    mv = memoryview(blob)
    deltas = unpack_uint(mv[1:], mv[0], n).astype(np.int64)
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    c = np.cumsum(deltas)
    # segmented cumsum: subtract the running total accumulated before each
    # segment (the stored start values are absolute, so the correction is
    # c[start-1] for every non-first segment)
    base = np.zeros(len(tfs), dtype=np.int64)
    base[1:] = c[starts[1:] - 1]
    return c - np.repeat(base, tfs)
