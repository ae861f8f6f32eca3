"""_rank_eval: precision/recall/MRR/nDCG vs a Python metric oracle."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.rankeval import rank_eval
from tests.conftest import TEST_CFG

K = 8


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    return {r.docid: r.text for r in rows}


def _ranking(fwd, query, k):
    """BM25 ranking on (round(score,4) desc, docid asc) — the engine's
    order_round=4 external contract."""
    toks = {d: tokenize_text(t) for d, t in fwd.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = Counter(t for ts in toks.values() for t in set(ts))
    scores = {}
    for d, ts in toks.items():
        tf = Counter(ts)
        s = 0.0
        for t in set(query.split()):
            if t not in tf or df[t] == 0:
                continue
            idf = float(np.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)))
            s += idf * tf[t] / (tf[t] + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
        if s > 0.0:
            scores[d] = round(s, 4)
    return [d for d, _ in sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]]


def _metrics(ranking, ratings, k):
    rels = [ratings.get(d, 0) for d in ranking]
    retrieved = len(ranking)
    rel_ret = sum(1 for r in rels if r > 0)
    total_rel = sum(1 for r in ratings.values() if r > 0)
    precision = rel_ret / retrieved if retrieved else 0.0
    recall = rel_ret / total_rel if total_rel else None
    mrr = 0.0
    for i, r in enumerate(rels, 1):
        if r > 0:
            mrr = 1.0 / i
            break
    dcg = sum((2.0**r - 1.0) / math.log2(i + 1) for i, r in enumerate(rels, 1))
    ideal = sorted((r for r in ratings.values() if r > 0), reverse=True)[:k]
    idcg = sum((2.0**r - 1.0) / math.log2(i + 1) for i, r in enumerate(ideal, 1))
    ndcg = dcg / idcg if idcg > 0 else None
    return retrieved, precision, recall, mrr, ndcg


def test_rank_eval_matches_python_oracle(spark, built_index, fwd):
    q1, q2 = "w0 w3", "w5 w9 w12"
    r1_docs = _ranking(fwd, q1, 20)
    # judgements: graded rels on a mix of retrieved and unretrieved docs
    ratings1 = {r1_docs[0]: 3, r1_docs[2]: 1, r1_docs[-1]: 2, min(fwd): 1}
    ratings2 = {min(fwd): 2}  # likely nothing retrieved is judged
    requests = {"q1": (q1, ratings1), "q2": (q2, ratings2)}
    out = {
        r.qid: r
        for r in rank_eval(spark, built_index, requests, k=K, cfg=TEST_CFG, key="docid").collect()
    }
    assert set(out) == {"q1", "q2"}
    for qid, (q, ratings) in requests.items():
        retrieved, prec, rec, mrr, ndcg = _metrics(_ranking(fwd, q, K), ratings, K)
        r = out[qid]
        assert r.retrieved == retrieved
        assert math.isclose(r.precision_k, prec, abs_tol=1e-9)
        if rec is None:
            assert r.recall_k is None
        else:
            assert math.isclose(r.recall_k, rec, abs_tol=1e-9)
        assert math.isclose(r.mrr, mrr, abs_tol=1e-9)
        if ndcg is None:
            assert r.ndcg is None
        else:
            assert math.isclose(r.ndcg, ndcg, abs_tol=1e-9)


def test_perfect_ranking_scores_one(spark, built_index, fwd):
    """Judging exactly the engine's top-k, graded by rank → ndcg=1,
    precision=1, mrr=1, recall=1."""
    q = "w0 w3"
    top = _ranking(fwd, q, K)
    ratings = {d: len(top) - i for i, d in enumerate(top)}
    out = rank_eval(
        spark, built_index, {"q": (q, ratings)}, k=K, cfg=TEST_CFG, key="docid"
    ).collect()[0]
    assert out.retrieved == K
    for v in (out.precision_k, out.recall_k, out.mrr, out.ndcg):
        assert math.isclose(v, 1.0, abs_tol=1e-9)


def test_no_hits_and_unjudged(spark, built_index, fwd):
    out = {
        r.qid: r
        for r in rank_eval(
            spark,
            built_index,
            {
                "miss": ("zzznotaterm", {1: 2}),
                "unjudged": ("w0", {}),
            },
            k=K,
            cfg=TEST_CFG,
            key="docid",
        ).collect()
    }
    m = out["miss"]
    assert (m.retrieved, m.precision_k, m.mrr) == (0, 0.0, 0.0)
    assert m.recall_k == 0.0 and m.ndcg == 0.0  # judged but nothing retrieved
    u = out["unjudged"]
    assert u.retrieved == K and u.precision_k == 0.0
    assert u.recall_k is None and u.ndcg is None and u.mrr == 0.0


def test_validation(spark, built_index):
    with pytest.raises(ValueError):
        rank_eval(spark, built_index, {"q": ("w0", {1: -1})}, cfg=TEST_CFG)
    with pytest.raises(ValueError):
        rank_eval(spark, built_index, {"q": ("w0", {})}, k=0, cfg=TEST_CFG)
    assert rank_eval(spark, built_index, {}, cfg=TEST_CFG).count() == 0


def test_mine_hard_negatives(spark, built_index):
    from mysql_es_spark.operators.rankeval import mine_hard_negatives

    REQ = {"q1": ("w0 w3", set()), "q2": ("w1 w5", set())}
    base = mine_hard_negatives(spark, built_index, REQ, k=10, cfg=TEST_CFG, key="docid").collect()
    by_q = {}
    for r in sorted(base, key=lambda r: (r.qid, r.neg_rank)):
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == {"q1", "q2"}
    for rows in by_q.values():
        assert [r.neg_rank for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-round(r.score, 4), r.ext_id) for r in rows]
        assert keys == sorted(keys)

    # positives leave the list; the remainder keeps its relative order
    top2 = {r.ext_id for r in by_q["q1"][:2]}
    REQ2 = {"q1": ("w0 w3", top2)}
    neg = mine_hard_negatives(spark, built_index, REQ2, k=10, cfg=TEST_CFG, key="docid").collect()
    got = [r.ext_id for r in sorted(neg, key=lambda r: r.neg_rank)]
    assert got == [r.ext_id for r in by_q["q1"] if r.ext_id not in top2]
    assert sorted(r.neg_rank for r in neg) == list(range(1, len(got) + 1))

    # skip_top drops the head; per_query caps the tail
    skipped = mine_hard_negatives(
        spark, built_index, REQ, k=10, skip_top=2, per_query=3, cfg=TEST_CFG,
        key="docid",
    ).collect()
    sq1 = [r.ext_id for r in sorted(skipped, key=lambda r: r.neg_rank) if r.qid == "q1"]
    assert sq1 == [r.ext_id for r in by_q["q1"][2:5]]
