"""Similarity search: exact top-k vs numpy; ANN recall vs exact."""

from __future__ import annotations

import numpy as np
import pytest

from mysql_es_spark.operators import similarity

N, DIM = 400, 16


@pytest.fixture(scope="module")
def emb_df(spark):
    """Clustered vectors — the regime ANN indexes exist for. Isotropic
    gaussian noise has no neighbor structure and any LSH's recall on it is
    near-random; real embedding corpora cluster."""
    rng = np.random.default_rng(123)
    centers = rng.standard_normal((12, DIM)) * 3.0
    M = centers[rng.integers(0, 12, size=N)] + 0.25 * rng.standard_normal((N, DIM))
    rows = [(i, [float(x) for x in M[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<double>")
    return df, M


def _numpy_topk(M, q, k):
    cos = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(cos)), key=lambda i: (-round(cos[i], 4), i))
    return order[:k]


def test_cosine_topk_exact(spark, emb_df):
    df, M = emb_df
    q = [float(x) for x in M[7]]
    got = [r.vec_id for r in similarity.cosine_topk(df, q, k=10).collect()]
    assert got == _numpy_topk(M, np.array(q), 10)
    assert got[0] == 7  # self is the nearest


def test_ann_topk_recall(spark, emb_df):
    df, M = emb_df
    planes = similarity.hyperplane_planes(DIM, 8, seed=42)
    bucketed = similarity.hyperplane_buckets(df, planes).cache()
    recalls = []
    for qid in [0, 50, 123]:
        q = [float(x) for x in M[qid]]
        exact = set(_numpy_topk(M, np.array(q), 10))
        approx = {
            r.vec_id
            for r in similarity.ann_topk(
                df, q, k=10, planes=planes, bucketed=bucketed, multiprobe=4
            ).collect()
        }
        assert qid in approx  # own bucket always probed → self found
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.4  # approximate, but useful


def test_query_buckets_multiprobe():
    planes = similarity.hyperplane_planes(8, 6, seed=1)
    probes = similarity.query_buckets([1.0] * 8, planes, multiprobe=3)
    assert len(probes) == 4 and len(set(probes)) == 4
    assert all(0 <= p < 2**6 for p in probes)


def test_ivf_topk_recall(spark, emb_df):
    df, M = emb_df
    cents = similarity.ivf_centroids(df, n_cells=12, seed=42)
    assert cents.shape == (12, DIM)
    assigned = similarity.ivf_assign(df, cents).cache()
    assert assigned.count() == N
    recalls = []
    for qid in [0, 50, 123]:
        q = [float(x) for x in M[qid]]
        exact = set(_numpy_topk(M, np.array(q), 10))
        approx = {
            r.vec_id
            for r in similarity.ivf_topk(
                df, q, k=10, centroids=cents, assigned=assigned, n_probe=3
            ).collect()
        }
        assert qid in approx  # the query's own cell is always probed
        recalls.append(len(exact & approx) / 10)
    # the fixture's vectors cluster tightly around 12 centers, so IVF with
    # 12 cells and 3 probes should be near-exact
    assert sum(recalls) / len(recalls) >= 0.8


def test_ivf_full_probe_equals_exact(spark, emb_df):
    df, M = emb_df
    cents = similarity.ivf_centroids(df, n_cells=8, seed=7)
    q = [float(x) for x in M[33]]
    exact = _numpy_topk(M, np.array(q), 10)
    got = [
        r.vec_id
        for r in similarity.ivf_topk(df, q, k=10, centroids=cents, n_probe=8).collect()
    ]
    assert got == exact  # probing every cell degenerates to brute force


def test_ivf_written_table_matches_inline(spark, tmp_path):
    import numpy as np
    from mysql_es_spark.operators.similarity import (
        ivf_centroids, ivf_topk, ivf_topk_from_table, write_ivf_table,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    C = ivf_centroids(emb, n_cells=8, seed=3)
    path = str(tmp_path / "ivf")
    write_ivf_table(emb, C, path)
    a = [(r.vec_id, r.cos) for r in
         ivf_topk_from_table(spark, path, qv, k=10, n_probe=3).collect()]
    b = [(r.vec_id, r.cos) for r in
         ivf_topk(emb, qv, k=10, n_probe=3, centroids=C).collect()]
    assert a == b

    # partition pruning engages: the probed cells appear in PartitionFilters
    import contextlib, io
    from pyspark.sql import functions as F
    assigned = spark.read.option("basePath", path).parquet(path)
    plan_df = assigned.filter(F.col("cell").isin([0, 1]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "cell" in plan.split("PartitionFilters")[1].splitlines()[0]


def test_pq_codes_shape_and_determinism(spark, emb_df):
    df, M = emb_df
    B = similarity.pq_codebooks(df, m=4, ksub=16, seed=7)
    assert B.shape == (4, 16, DIM // 4)
    codes = similarity.pq_encode(df, B).collect()
    assert len(codes) == N
    for r in codes:
        assert len(r.code) == 4 and all(0 <= c < 16 for c in r.code)
    B2 = similarity.pq_codebooks(df, m=4, ksub=16, seed=7)
    assert np.array_equal(B, B2)


def test_pq_adc_shortlist_recall(spark, emb_df):
    """The PQ contract is shortlist recall: the compressed ADC scan's
    top-50 must contain (nearly) all true top-10, so a 50-vector exact
    re-rank recovers the brute-force answer from a scan that never reads
    the original vectors. (ADC alone cannot fine-order within a tight
    cluster — quantization error exceeds the within-cluster score gaps —
    which is why FAISS IVFPQ always re-ranks a shortlist.)"""
    df, M = emb_df
    B = similarity.pq_codebooks(df, m=4, ksub=16, seed=7)
    codes = similarity.pq_encode(df, B).cache()
    hits = 0
    for qi in (3, 77, 200):
        q = [float(x) for x in M[qi]]
        truth = set(_numpy_topk(M, np.array(q), 10))
        short = {r.vec_id for r in similarity.pq_topk(codes, q, B, k=50).collect()}
        hits += len(truth & short)
    assert hits / 30 >= 0.9, f"ADC shortlist recall too low: {hits}/30"
    # and the re-ranked result equals brute force on the same shortlist
    q = [float(x) for x in M[77]]
    got = similarity.pq_topk(codes, q, B, k=10, emb=df, rerank=50).collect()
    want = similarity.cosine_topk(df, q, k=10).collect()
    assert [(r.vec_id, r.score) for r in got] == [(r.vec_id, r.cos) for r in want]


def test_pq_rerank_exact(spark, emb_df):
    """ADC shortlist + exact re-rank: with a wide-enough shortlist the
    final top-k equals brute force exactly."""
    df, M = emb_df
    B = similarity.pq_codebooks(df, m=4, ksub=16, seed=7)
    codes = similarity.pq_encode(df, B)
    q = [float(x) for x in M[42]]
    got = similarity.pq_topk(codes, q, B, k=10, emb=df, rerank=N).collect()
    want = similarity.cosine_topk(df, q, k=10).collect()
    assert [(r.vec_id, r.score) for r in got] == [(r.vec_id, r.cos) for r in want]


def test_pq_validation(spark, emb_df):
    df, M = emb_df
    with pytest.raises(ValueError):
        similarity.pq_codebooks(df, m=5)  # 16 % 5 != 0
    B = similarity.pq_codebooks(df, m=4, ksub=16, seed=7)
    codes = similarity.pq_encode(df, B)
    q = [float(x) for x in M[0]]
    with pytest.raises(ValueError):
        similarity.pq_topk(codes, q, B, rerank=50)  # no emb table


def test_cosine_topk_filtered(spark, emb_df):
    """ES kNN filter context: pre-filter, so results == brute force over
    the filtered subset only (never a post-filtered short page)."""
    df, M = emb_df
    from pyspark.sql import functions as F

    labeled = df.withColumn("label", (F.col("vec_id") % 3).cast("int"))
    q = [float(x) for x in M[7]]
    got = [r.vec_id for r in
           similarity.cosine_topk(labeled, q, k=10, where="label = 1").collect()]
    keep = [i for i in range(len(M)) if i % 3 == 1]
    cos = (M[keep] @ np.array(q)) / (
        np.linalg.norm(M[keep], axis=1) * np.linalg.norm(np.array(q)))
    exp = [keep[i] for i in sorted(range(len(keep)),
                                   key=lambda i: (-round(cos[i], 4), keep[i]))][:10]
    assert got == exp
    assert all(v % 3 == 1 for v in got)
