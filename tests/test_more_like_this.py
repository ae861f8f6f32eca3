"""more_like_this: MLT term selection + BM25 vs a pure-Python oracle."""

from __future__ import annotations

from collections import Counter

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.oracle import build_oracle_index, idf, score_query
from mysql_es_spark.operators.query import more_like_this_topk
from tests.conftest import TEST_CFG


@pytest.fixture(scope="module")
def fwd_rows(spark, built_index):
    return spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()


@pytest.fixture(scope="module")
def oracle_ix(fwd_rows):
    return build_oracle_index([(r.docid, r.text) for r in fwd_rows])


def mlt_oracle(oracle_ix, text: str, src: int, k: int, max_terms: int):
    tf = Counter(tokenize_text(text))
    ranked = sorted(
        (
            (round(tf[t] * idf(oracle_ix.n_docs, len(oracle_ix.postings[t][0])), 6), t)
            for t in tf
            if t in oracle_ix.postings
        ),
        key=lambda x: (-x[0], x[1]),
    )
    terms = [t for _, t in ranked[:max_terms]]
    hits = [(d, s) for d, s in score_query(oracle_ix, " ".join(terms), k + 1) if d != src]
    return hits[:k]


@pytest.mark.parametrize("src_pos", [0, 17, 101])
def test_mlt_matches_oracle(spark, built_index, fwd_rows, oracle_ix, src_pos):
    src = fwd_rows[src_pos]
    got = [
        (r.docid, r.score)
        for r in more_like_this_topk(
            spark, built_index, src.docid, k=10, max_query_terms=5, cfg=TEST_CFG
        ).collect()
    ]
    want = mlt_oracle(oracle_ix, src.text, src.docid, k=10, max_terms=5)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6
    assert src.docid not in [d for d, _ in got]


def test_mlt_unknown_doc_empty(spark, built_index):
    assert more_like_this_topk(spark, built_index, 10**12, k=5, cfg=TEST_CFG).count() == 0


def test_mlt_unlike_removes_negative_terms(spark, built_index, fwd_rows, oracle_ix):
    src = fwd_rows[0]
    negs = [fwd_rows[17], fwd_rows[101]]
    banned = {t for r in negs if r.text for t in tokenize_text(r.text)}
    # oracle: same MLT selection over the filtered tf
    tf = Counter(t for t in tokenize_text(src.text) if t not in banned)
    ranked = sorted(
        (
            (round(tf[t] * idf(oracle_ix.n_docs, len(oracle_ix.postings[t][0])), 6), t)
            for t in tf
            if t in oracle_ix.postings
        ),
        key=lambda x: (-x[0], x[1]),
    )
    terms = [t for _, t in ranked[:5]]
    got = [
        (r.docid, r.score)
        for r in more_like_this_topk(
            spark, built_index, src.docid, k=10, max_query_terms=5, cfg=TEST_CFG,
            unlike=[n.docid for n in negs],
        ).collect()
    ]
    if terms:
        want = [
            (d, s)
            for d, s in score_query(oracle_ix, " ".join(terms), 11)
            if d != src.docid
        ][:10]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-6
    else:
        assert got == []
    # an unlike doc covering the whole source vocabulary yields no query
    assert (
        more_like_this_topk(
            spark, built_index, src.docid, k=5, cfg=TEST_CFG, unlike=[src.docid]
        ).count()
        == 0
    )
