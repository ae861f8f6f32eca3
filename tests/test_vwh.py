"""variable_width_histogram: deterministic agglomerative clustering of
the matched docs' lengths — checked against an independent quadratic
reference and structural invariants."""

from __future__ import annotations

import pytest

from mysql_es_spark.operators.aggs import _matched_docids, variable_width_histogram
from mysql_es_spark.operators.query import effective_config
from mysql_es_spark.sources import tables as tbl
from tests.conftest import TEST_CFG

Q = "w0 w3"


def _reference(pairs, buckets):
    """Naive O(n^2) re-derivation of the same merge rule: repeatedly merge
    the adjacent cluster pair with the smallest centroid gap (leftmost on
    ties)."""
    clusters = [[v * w, w, v, v] for v, w in pairs]  # sum, cnt, min, max
    while len(clusters) > buckets:
        best_i, best_gap = 0, None
        for i in range(len(clusters) - 1):
            gap = clusters[i + 1][0] / clusters[i + 1][1] - clusters[i][0] / clusters[i][1]
            if best_gap is None or gap < best_gap:
                best_i, best_gap = i, gap
        a, b = clusters[best_i], clusters[best_i + 1]
        clusters[best_i : best_i + 2] = [[a[0] + b[0], a[1] + b[1], a[2], b[3]]]
    return [(s / c, int(lo), int(hi), int(c)) for s, c, lo, hi in clusters]


def _matched_dl_pairs(spark, built_index):
    cfg = effective_config(spark, built_index, TEST_CFG)
    m = _matched_docids(spark, built_index, Q, cfg)
    dls = tbl.read(spark, built_index, "doc_lens")
    rows = m.join(dls, "docid").groupBy("dl").count().orderBy("dl").collect()
    return [(float(r.dl), float(r["count"])) for r in rows]


@pytest.mark.parametrize("buckets", [1, 3, 8])
def test_matches_reference(spark, built_index, buckets):
    pairs = _matched_dl_pairs(spark, built_index)
    assert len(pairs) > 8
    exp = _reference(pairs, buckets)
    got = variable_width_histogram(spark, built_index, Q, buckets=buckets, cfg=TEST_CFG).collect()
    assert [(round(r.key, 9), r.min_dl, r.max_dl, r.n_docs) for r in got] == [
        (round(k, 9), lo, hi, c) for k, lo, hi, c in exp
    ]


def test_invariants(spark, built_index):
    pairs = _matched_dl_pairs(spark, built_index)
    total = sum(int(w) for _, w in pairs)
    got = variable_width_histogram(spark, built_index, Q, buckets=5, cfg=TEST_CFG).collect()
    assert 1 <= len(got) <= 5
    assert sum(r.n_docs for r in got) == total
    for a, b in zip(got, got[1:]):
        assert a.max_dl < b.min_dl, "buckets must be disjoint and ordered"
    for r in got:
        assert r.min_dl <= r.key <= r.max_dl


def test_edges(spark, built_index):
    assert variable_width_histogram(spark, built_index, "zzznope", buckets=4, cfg=TEST_CFG).count() == 0
    with pytest.raises(ValueError):
        variable_width_histogram(spark, built_index, Q, buckets=0, cfg=TEST_CFG)
    with pytest.raises(ValueError):
        variable_width_histogram(spark, built_index, Q, buckets=4, cfg=TEST_CFG, max_distinct=3)
