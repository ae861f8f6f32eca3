"""dis_max query: best-sub-query + tie_breaker, vs a Python oracle."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import bm25_topk, dis_max_topk
from tests.conftest import TEST_CFG

SUBS = ["w0 w3", "w5 w9", "w7"]


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    return {r.docid: r.text for r in rows}


def _sub_scores(fwd, sub_terms):
    toks = {d: tokenize_text(t) for d, t in fwd.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = Counter(t for ts in toks.values() for t in set(ts))
    out = {}
    for d, ts in toks.items():
        tf = Counter(ts)
        subs = []
        for terms in sub_terms:
            s = 0.0
            for t in set(terms):
                if t not in tf or df[t] == 0:
                    continue
                idf = float(np.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)))
                s += idf * tf[t] / (tf[t] + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
            if s > 0.0:
                subs.append(s)
        if subs:
            out[d] = subs
    return out


def _oracle(fwd, queries, tie, k):
    per_doc = _sub_scores(fwd, [q.split() for q in queries])
    scores = {
        d: max(subs) + tie * (sum(subs) - max(subs)) for d, subs in per_doc.items()
    }
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_dis_max_matches_oracle(spark, built_index, fwd, tie):
    want = _oracle(fwd, SUBS, tie, 12)
    got = dis_max_topk(spark, built_index, SUBS, tie_breaker=tie, k=12, cfg=TEST_CFG).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)


def test_single_subquery_equals_bm25(spark, built_index):
    plain = bm25_topk(spark, built_index, "w0 w3", k=10, cfg=TEST_CFG).collect()
    dm = dis_max_topk(spark, built_index, ["w0 w3"], k=10, cfg=TEST_CFG).collect()
    assert [(r.docid, round(r.score, 9)) for r in plain] == [
        (r.docid, round(r.score, 9)) for r in dm
    ]


def test_tie_breaker_one_is_union_sum(spark, built_index, fwd):
    """tie_breaker=1 sums sub-scores; with disjoint sub-queries that's
    plain BM25 over the union of terms."""
    plain = bm25_topk(spark, built_index, "w0 w3 w5", k=10, cfg=TEST_CFG).collect()
    dm = dis_max_topk(spark, built_index, ["w0 w3", "w5"], tie_breaker=1.0, k=10, cfg=TEST_CFG).collect()
    assert [(r.docid, round(r.score, 9)) for r in plain] == [
        (r.docid, round(r.score, 9)) for r in dm
    ]


def test_shared_term_counts_in_both_subqueries(spark, built_index, fwd):
    got = dis_max_topk(spark, built_index, ["w0", "w0 w3"], tie_breaker=0.5, k=8, cfg=TEST_CFG).collect()
    want = _oracle(fwd, ["w0", "w0 w3"], 0.5, 8)
    assert [r.docid for r in got] == [d for d, _ in want]


def test_edge_cases(spark, built_index):
    assert dis_max_topk(spark, built_index, [], cfg=TEST_CFG).count() == 0
    assert dis_max_topk(spark, built_index, ["zzznotaterm"], cfg=TEST_CFG).count() == 0
    with pytest.raises(ValueError):
        dis_max_topk(spark, built_index, ["w0"], tie_breaker=1.5, cfg=TEST_CFG)
    keyed = dis_max_topk(spark, built_index, SUBS, k=3, cfg=TEST_CFG, with_keys=True)
    assert {"conv_id", "score"} <= set(keyed.columns)
    assert keyed.count() == 3
