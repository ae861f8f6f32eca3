"""RRF hybrid fusion vs a Python oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.operators.fusion import rrf_fuse, with_rank


def _mk(spark, rows, cols="doc_id long, s double"):
    return spark.createDataFrame(rows, cols)


def test_rrf_matches_python(spark):
    a = [(1, 0.9), (2, 0.8), (3, 0.7), (4, 0.6)]
    b = [(3, 0.99), (5, 0.5), (1, 0.4)]
    ra = with_rank(_mk(spark, a), [F.desc("s"), F.asc("doc_id")])
    rb = with_rank(_mk(spark, b), [F.desc("s"), F.asc("doc_id")])
    got = rrf_fuse([ra, rb], k=10, rrf_k=60).collect()

    want: dict[int, float] = {}
    nret: dict[int, int] = {}
    for lst in (a, b):
        order = sorted(lst, key=lambda x: (-x[1], x[0]))
        for r, (d, _) in enumerate(order, 1):
            want[d] = want.get(d, 0.0) + 1.0 / (60 + r)
            nret[d] = nret.get(d, 0) + 1
    w = sorted(want.items(), key=lambda x: (-x[1], x[0]))
    assert [(r.doc_id, r.n_retrievers) for r in got] == [(d, nret[d]) for d, _ in w]
    for r, (_, s) in zip(got, w):
        assert math.isclose(r.score, s, abs_tol=1e-12)
    # the RRF property: doc 3 (rank 3 + rank 1) beats doc 2 (rank 2 alone)
    ids = [r.doc_id for r in got]
    assert ids.index(3) < ids.index(2)


def test_rrf_validation_and_single(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
    a = with_rank(
        _mk(spark, [(1, 0.5), (2, 0.4)]), [F.desc("s"), F.asc("doc_id")]
    )
    got = rrf_fuse([a], k=1).collect()
    assert [(got[0].doc_id, got[0].n_retrievers)] == [(1, 1)]
    assert math.isclose(got[0].score, 1 / 61, abs_tol=1e-12)


def test_linear_fuse_matches_python(spark):
    a = [(1, 2.0), (2, 1.5), (3, 1.0)]
    b = [(3, 0.9), (4, 0.8)]
    fa = _mk(spark, a)
    fb = _mk(spark, b)
    got = rrf = None
    from mysql_es_spark.operators.fusion import linear_fuse

    got = linear_fuse([(fa, 1.0), (fb, 5.0)], k=10).collect()
    want: dict[int, float] = {}
    nret: dict[int, int] = {}
    for lst, w in ((a, 1.0), (b, 5.0)):
        for d, s in lst:
            want[d] = want.get(d, 0.0) + w * s
            nret[d] = nret.get(d, 0) + 1
    ws = sorted(want.items(), key=lambda x: (-x[1], x[0]))
    assert [(r.doc_id, r.n_retrievers) for r in got] == [(d, nret[d]) for d, _ in ws]
    for r, (_, s) in zip(got, ws):
        assert math.isclose(r.score, s, abs_tol=1e-12)
    # doc 3 (1.0 + 5*0.9) outranks doc 1 (2.0) — vector weight dominates
    ids = [r.doc_id for r in got]
    assert ids.index(3) < ids.index(1)
    with pytest.raises(ValueError):
        linear_fuse([])
