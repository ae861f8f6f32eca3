"""LM-Dirichlet similarity: rank + score identity vs a Python oracle,
empty/unknown probes, and deletes masking."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import lm_dirichlet_topk, query_terms
from tests.conftest import TEST_CFG

MU = 2000.0


def lm_oracle(rows, query, k, mu=MU):
    """Lucene LMDirichletSimilarity over raw (docid, text) rows."""
    toks = {r.docid: tokenize_text(r.text) for r in rows}
    coll = sum(len(t) for t in toks.values())
    ttf = Counter(t for ts in toks.values() for t in ts)
    scores = {}
    for d, ts in toks.items():
        tf = Counter(ts)
        s = 0.0
        hit = False
        for q in query_terms(query):
            if q not in ttf or q not in tf:
                continue
            hit = True
            pc = ttf[q] / coll
            s += max(0.0, math.log(1 + tf[q] / (mu * pc)) + math.log(mu / (len(ts) + mu)))
        if hit:
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


@pytest.fixture(scope="module")
def fwd_rows(spark, built_index):
    return spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()


def test_lm_rank_and_score_identity(spark, built_index, fwd_rows):
    want = lm_oracle(fwd_rows, "w0 w3", k=15)
    got = lm_dirichlet_topk(spark, built_index, "w0 w3", k=15, cfg=TEST_CFG).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)


def test_lm_single_term_and_mu_sensitivity(spark, built_index, fwd_rows):
    for mu in (500.0, 5000.0):
        want = lm_oracle(fwd_rows, "w1", k=10, mu=mu)
        got = lm_dirichlet_topk(spark, built_index, "w1", k=10, mu=mu, cfg=TEST_CFG).collect()
        assert [r.docid for r in got] == [d for d, _ in want], mu
        for r, (_, s) in zip(got, want):
            assert math.isclose(r.score, s, abs_tol=1e-9)


def test_lm_probes(spark, built_index):
    assert lm_dirichlet_topk(spark, built_index, "", k=5, cfg=TEST_CFG).count() == 0
    assert lm_dirichlet_topk(spark, built_index, "zzznope", k=5, cfg=TEST_CFG).count() == 0


def test_lm_masks_deletes(spark, tiny_transcripts, tmp_path_factory):
    import shutil

    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.plans.deletes import delete_by_query

    d = str(tmp_path_factory.mktemp("lmdel") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, tiny_transcripts, d, TEST_CFG)
    rows = spark.read.parquet(f"{d}/forward").select("docid", "text").collect()
    n = delete_by_query(spark, d, "w0", cfg=TEST_CFG)
    assert n > 0
    deleted = {r.docid for r in rows if "w0" in set(tokenize_text(r.text))}
    got = lm_dirichlet_topk(spark, d, "w0 w3", k=10_000, cfg=TEST_CFG).collect()
    assert got and not ({r.docid for r in got} & deleted)
    # surviving docs keep pre-delete scores (collection stats unchanged)
    want = {d_: s for d_, s in lm_oracle(rows, "w0 w3", k=len(rows))}
    for r in got:
        assert math.isclose(r.score, want[r.docid], abs_tol=1e-9)
