"""LTR feature logging: per-pair features vs the Python BM25 oracle."""

from __future__ import annotations

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.rankeval import ltr_features
from mysql_es_spark.oracle import build_oracle_index, score_query


@pytest.fixture(scope="module")
def fwd_rows(spark, built_index):
    return spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()


def test_features_match_python_oracle(spark, built_index, fwd_rows):
    oracle = build_oracle_index([(r.docid, r.text) for r in fwd_rows])
    text_of = {r.docid: r.text for r in fwd_rows}
    docids = sorted(text_of)
    q1, q2 = "w0 w3", "w1 w7 w9"
    # judge a mix: matching docs, plus one id far outside the corpus
    judged = {
        "q1": (q1, {docids[0]: 2.0, docids[3]: 0.0, docids[7]: 1.0}),
        "q2": (q2, {docids[1]: 1.0, 10**9: 0.0}),
    }
    out = ltr_features(spark, built_index, judged, key="docid").collect()
    assert len(out) == 5

    scores = {("q1", d): s for d, s in score_query(oracle, q1, k=10**6)}
    scores.update({("q2", d): s for d, s in score_query(oracle, q2, k=10**6)})
    for r in out:
        want = scores.get((r.qid, r.ext_id), 0.0)
        assert r.bm25 == pytest.approx(want, abs=1e-9), (r.qid, r.ext_id)
        qterms = set(tokenize_text(judged[r.qid][0]))
        if r.ext_id in text_of:
            toks = tokenize_text(text_of[r.ext_id])
            assert r.matched_terms == len(qterms & set(toks))
            assert r.dl == len(toks)
        else:  # unknown doc: no doc values, bm25 logged as 0 (ES contract)
            assert r.dl is None and r.bm25 == 0.0 and r.matched_terms == 0
        assert r.query_len == len(set(qterms))


def test_field_features_and_validation(spark, built_index, fwd_rows):
    docids = sorted(r.docid for r in fwd_rows)
    judged = {"q": ("w0", {docids[0]: 1.0})}
    out = ltr_features(
        spark,
        built_index,
        judged,
        key="docid",
        field_features={"tlen": "length(text)"},
    ).collect()[0]
    assert out.tlen == len(next(r.text for r in fwd_rows if r.docid == out.ext_id))
    with pytest.raises(ValueError):
        ltr_features(
            spark, built_index, judged, key="docid",
            field_features={"bad": "rand()"},
        )


def test_empty_requests(spark, built_index):
    assert ltr_features(spark, built_index, {}, key="docid").count() == 0
