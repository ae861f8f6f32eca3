"""Conjunctive (posting-list intersection) BM25 — rank identity vs oracle.

The intersection path must return exactly the docs containing EVERY query
term, scored identically to the disjunctive engine/oracle, with the
salt-level structural pruning never dropping a true match.
"""

from __future__ import annotations

import math

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.oracle import build_oracle_index, score_query
from mysql_es_spark.operators.query import bm25_topk_conjunctive, query_terms
from tests.conftest import TEST_CFG

# queries chosen to have non-trivial but non-empty intersections on the
# Zipf corpus: head terms co-occur often; add one mid-tail term
CONJ_QUERIES = ["w0 w1", "w0 w1 w2", "w1 w5 w20", "w0 w250"]


@pytest.fixture(scope="module")
def corpus_rows(spark, built_index):
    return (
        spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    )


@pytest.fixture(scope="module")
def oracle_ix(corpus_rows):
    return build_oracle_index([(r.docid, r.text) for r in corpus_rows])


def expected_conjunctive(corpus_rows, oracle_ix, q: str, k: int):
    terms = set(query_terms(q))
    all_terms_docs = {
        r.docid for r in corpus_rows if terms.issubset(set(tokenize_text(r.text)))
    }
    full = score_query(oracle_ix, q, k=len(corpus_rows))
    return [(d, s) for d, s in full if d in all_terms_docs][:k]


@pytest.mark.parametrize("q", CONJ_QUERIES)
def test_conjunctive_rank_identity(spark, built_index, corpus_rows, oracle_ix, q):
    got = [
        (r.docid, r.score)
        for r in bm25_topk_conjunctive(spark, built_index, q, k=20, cfg=TEST_CFG).collect()
    ]
    want = expected_conjunctive(corpus_rows, oracle_ix, q, 20)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, abs_tol=1e-9)


def test_conjunctive_missing_term_empty(spark, built_index):
    out = bm25_topk_conjunctive(
        spark, built_index, "w0 zzznotaterm", k=5, cfg=TEST_CFG
    ).collect()
    assert out == []


def test_conjunctive_subset_of_disjunctive(spark, built_index, corpus_rows):
    """Every conjunctive hit contains all terms (hard containment check)."""
    q = "w0 w1"
    terms = set(query_terms(q))
    hits = bm25_topk_conjunctive(
        spark, built_index, q, k=50, cfg=TEST_CFG, with_keys=True
    ).collect()
    assert hits
    for r in hits:
        assert terms.issubset(set(tokenize_text(r.text)))
