import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_es_spark.functions.codecs import (
    decode_block,
    encode_block,
    pack_uint,
    unpack_uint,
)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300))
@settings(max_examples=60, deadline=None)
def test_pack_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    w, buf = pack_uint(arr)
    out = unpack_uint(buf, w, len(arr))
    assert np.array_equal(out, arr)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),  # docid
            st.integers(min_value=1, max_value=500),  # tf
            st.integers(min_value=0, max_value=5000),  # dl
        ),
        min_size=1,
        max_size=256,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=60, deadline=None)
def test_block_roundtrip(postings):
    postings.sort()
    ids = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    blob = encode_block(ids, tfs, dls)
    rid, rtf, rdl = decode_block(blob, len(ids))
    assert np.array_equal(rid, ids)
    assert np.array_equal(rtf, tfs)
    assert np.array_equal(rdl, dls)


def test_dense_block_compresses():
    """Consecutive docids (head-term shape) pack near 1 bit/posting."""
    ids = np.arange(10_000, 10_128, dtype=np.int64)
    tfs = np.ones(128, dtype=np.int64)
    dls = np.full(128, 60, dtype=np.int64)
    blob = encode_block(ids, tfs, dls)
    # deltas all 1 → 1 bit each; tf all 1 → 1 bit; dl constant 60 → 6 bits
    # = 11 header + 16 + 16 + 96 = 139 bytes vs 2048 raw (128 × 16B)
    assert len(blob) == 139
    assert len(blob) < 128 * 16 / 10


def test_single_posting_block():
    blob = encode_block(np.array([7]), np.array([3]), np.array([11]))
    rid, rtf, rdl = decode_block(blob, 1)
    assert rid.tolist() == [7] and rtf.tolist() == [3] and rdl.tolist() == [11]


def test_unsorted_docids_rejected_by_contract():
    # contract: caller sorts; deltas would go negative → huge uint64 widths.
    ids = np.array([5, 3], dtype=np.int64)
    blob = encode_block(np.sort(ids), np.array([1, 1]), np.array([1, 1]))
    rid, _, _ = decode_block(blob, 2)
    assert rid.tolist() == [3, 5]


def test_empty_pack():
    w, buf = pack_uint(np.array([], dtype=np.uint64))
    assert w == 0 and buf == b""
    assert unpack_uint(b"", 0, 0).tolist() == []


def test_positions_roundtrip_property():
    from mysql_es_spark.functions.codecs import decode_positions, encode_positions

    rng = np.random.default_rng(7)
    for _ in range(100):
        n_post = int(rng.integers(1, 16))
        tfs, pos = [], []
        for _ in range(n_post):
            tf = int(rng.integers(1, 9))
            pos.append(np.sort(rng.choice(4096, size=tf, replace=False)))
            tfs.append(tf)
        tfs = np.array(tfs, dtype=np.int64)
        flat = np.concatenate(pos)
        assert np.array_equal(decode_positions(encode_positions(flat, tfs), tfs), flat)


def test_positions_empty():
    from mysql_es_spark.functions.codecs import decode_positions, encode_positions

    empty = np.zeros(0, dtype=np.int64)
    assert len(decode_positions(encode_positions(empty, empty), empty)) == 0
