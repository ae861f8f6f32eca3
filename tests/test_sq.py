"""int8 scalar quantization (ES dense_vector int8 kNN): encode bounds,
roundtrip error, approximate recall, rerank-exact contract."""

from __future__ import annotations

import numpy as np
import pytest

from mysql_es_spark.operators import similarity
from mysql_es_spark.operators.similarity import (
    cosine_topk,
    sq_encode,
    sq_params,
    sq_topk,
)

N, DIM = 400, 16


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((12, DIM)) * 3.0
    M = centers[rng.integers(0, 12, size=N)] + 0.25 * rng.standard_normal((N, DIM))
    rows = [(i, [float(x) for x in M[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), M


def test_sq_params_bounds(emb_df):
    df, M = emb_df
    lo, hi = sq_params(df)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    assert Mn.min() - 1e-6 <= lo < hi <= Mn.max() + 1e-6
    # extreme quantiles recover (approximately) the full range
    lo0, hi0 = sq_params(df, lo_q=0.0, hi_q=1.0)
    assert lo0 == pytest.approx(Mn.min(), abs=1e-9)
    assert hi0 == pytest.approx(Mn.max(), abs=1e-9)


def test_sq_encode_roundtrip_error(emb_df):
    df, M = emb_df
    lo, hi = -1.0, 1.0
    delta = (hi - lo) / 255.0
    codes = {r.vec_id: r.code for r in sq_encode(df, lo, hi).collect()}
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for i in (0, 7, 123):
        decoded = lo + delta * (np.array(codes[i], dtype=np.float64) + 128.0)
        assert np.abs(decoded - Mn[i]).max() <= delta / 2 + 1e-9
        assert all(-128 <= b <= 127 for b in codes[i])


def test_sq_encode_clips_out_of_range(spark):
    df = spark.createDataFrame(
        [(0, [10.0, 0.0]), (1, [-10.0, 0.0])], "vec_id long, embedding array<double>"
    )
    # normalized components are ±1, bounds narrower → clipped to the rails
    codes = {r.vec_id: r.code for r in sq_encode(df, -0.5, 0.5).collect()}
    assert codes[0][0] == 127 and codes[1][0] == -128
    with pytest.raises(ValueError):
        sq_encode(df, 0.5, 0.5)


def test_sq_topk_recall_and_rerank_exact(emb_df):
    df, M = emb_df
    q = [float(x) for x in M[3]]
    lo, hi = sq_params(df)
    codes = sq_encode(df, lo, hi).cache()
    exact = [r.vec_id for r in cosine_topk(df, q, k=10).collect()]
    approx = [r.vec_id for r in sq_topk(codes, q, lo, hi, k=10).collect()]
    # raw ADC ordering: high overlap (ties inside tight clusters may swap)
    assert len(set(exact) & set(approx)) >= 7
    # the practical mode: a small rerank shortlist recovers the exact page
    rer50 = sq_topk(codes, q, lo, hi, k=10, emb=df, rerank=50).collect()
    want = cosine_topk(df, q, k=10).collect()
    assert [(r.vec_id, r.score) for r in rer50] == [(r.vec_id, r.cos) for r in want]
    # rerank over the whole corpus reproduces cosine_topk exactly
    rer = sq_topk(codes, q, lo, hi, k=10, emb=df, rerank=N).collect()
    assert [(r.vec_id, r.score) for r in rer] == [(r.vec_id, r.cos) for r in want]
    with pytest.raises(ValueError):
        sq_topk(codes, q, lo, hi, k=5, rerank=10)  # rerank without emb


def test_sq_partition_invariance(emb_df):
    df, M = emb_df
    q = [float(x) for x in M[11]]
    a = [tuple(r) for r in sq_topk(sq_encode(df, -1, 1), q, -1, 1, k=8).collect()]
    b = [
        tuple(r)
        for r in sq_topk(sq_encode(df.repartition(17), -1, 1), q, -1, 1, k=8).collect()
    ]
    assert a == b


# ---------------------------------------------------------------------------
# 1-bit binary quantization (BBQ-style)
# ---------------------------------------------------------------------------


def _bbq_python_bits(vec, centroid):
    import numpy as np

    v = np.asarray(vec, dtype=np.float64)
    v = v / max(float(np.linalg.norm(v)), 1e-12)
    u = v - np.asarray(centroid, dtype=np.float64)
    dim = len(centroid)
    words = []
    for w in range((dim + 63) // 64):
        acc = 0
        for i in range(min(64, dim - w * 64)):
            if u[w * 64 + i] > 0:
                acc |= 1 << i
        if acc >= 1 << 63:
            acc -= 1 << 64
        words.append(acc)
    return words


def test_bbq_encode_matches_python(spark, emb_df):
    emb_df, _M = emb_df
    from mysql_es_spark.operators.similarity import bbq_centroid, bbq_encode

    centroid = bbq_centroid(emb_df)
    rows = emb_df.collect()
    got = {r.vec_id: list(r.bits) for r in bbq_encode(emb_df, centroid).collect()}
    for r in rows:
        assert got[r.vec_id] == _bbq_python_bits(r.embedding, centroid), r.vec_id


def test_bbq_hamming_and_full_rerank_equals_brute(spark, emb_df):
    emb_df, _M = emb_df
    from mysql_es_spark.operators.similarity import (
        bbq_centroid,
        bbq_encode,
        bbq_topk,
        cosine_topk,
    )

    centroid = bbq_centroid(emb_df)
    bits = bbq_encode(emb_df, centroid)
    rows = emb_df.collect()
    q = list(rows[3].embedding)

    approx = bbq_topk(bits, q, centroid, k=5).collect()
    qb = _bbq_python_bits(q, centroid)
    def ham(a, b):
        return sum(bin((x ^ y) & ((1 << 64) - 1)).count("1") for x, y in zip(a, b))
    want = sorted(
        ((ham(_bbq_python_bits(r.embedding, centroid), qb), r.vec_id) for r in rows)
    )[:5]
    assert [(r.hamming, r.vec_id) for r in approx] == want

    n = emb_df.count()
    exact = bbq_topk(bits, q, centroid, k=5, emb=emb_df, rerank=n).collect()
    brute = cosine_topk(emb_df, q, k=5).collect()
    assert [(r.vec_id, r.score) for r in exact] == [(r.vec_id, r.cos) for r in brute]


def test_bbq_odd_dim_packs_partial_word(spark):
    from mysql_es_spark.operators.similarity import bbq_encode

    df = spark.createDataFrame(
        [(1, [1.0] * 70), (2, [-1.0] * 70)], "vec_id long, embedding array<double>"
    )
    centroid = [0.0] * 70
    got = {r.vec_id: list(r.bits) for r in bbq_encode(df, centroid).collect()}
    assert len(got[1]) == 2
    assert got[1] == _bbq_python_bits([1.0] * 70, centroid)
    assert got[2] == [0, 0]  # all components below threshold


def test_bbq_shortlist_recall_on_clusters(spark, emb_df):
    emb_df, _M = emb_df
    from mysql_es_spark.operators.similarity import (
        bbq_centroid,
        bbq_encode,
        bbq_topk,
        cosine_topk,
    )

    centroid = bbq_centroid(emb_df)
    bits = bbq_encode(emb_df, centroid)
    rows = emb_df.collect()
    q = list(rows[11].embedding)
    short = {r.vec_id for r in bbq_topk(bits, q, centroid, k=40).collect()}
    true10 = {r.vec_id for r in cosine_topk(emb_df, q, k=10).collect()}
    assert len(short & true10) >= 7  # 1-bit shortlist keeps most true hits
