"""Boosting query (ES negative-boost demotion) + unigram-LM quality."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import boosting_topk
from mysql_es_spark.operators.textstats import lm_quality
from mysql_es_spark.oracle import build_oracle_index, score_query
from tests.conftest import TEST_CFG

POS, NEG, NB = "w0 w3", "w1", 0.4


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    return (
        spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    )


def test_boosting_matches_oracle(spark, built_index, fwd):
    oix = build_oracle_index([(r.docid, r.text) for r in fwd])
    pos = dict(score_query(oix, POS, k=len(fwd)))
    neg_docs = {d for d, t in ((r.docid, r.text) for r in fwd) if "w1" in tokenize_text(t)}
    want = sorted(
        ((d, s * NB if d in neg_docs else s) for d, s in pos.items()),
        key=lambda x: (-x[1], x[0]),
    )[:12]
    got = boosting_topk(
        spark, built_index, POS, NEG, negative_boost=NB, k=12, cfg=TEST_CFG
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)
    # demotion genuinely reordered something vs the plain positive ranking
    plain = [d for d, _ in sorted(pos.items(), key=lambda x: (-x[1], x[0]))[:12]]
    assert plain != [d for d, _ in want], "weak test: negative clause changed nothing"


def test_boosting_edge_cases(spark, built_index):
    assert boosting_topk(spark, built_index, "", NEG, cfg=TEST_CFG).count() == 0
    # absent negative vocabulary == plain positive ranking
    a = boosting_topk(spark, built_index, POS, "zzzyqq", cfg=TEST_CFG).collect()
    b = boosting_topk(spark, built_index, POS, "", cfg=TEST_CFG).collect()
    assert [(r.docid, r.score) for r in a] == [(r.docid, r.score) for r in b]
    with pytest.raises(ValueError):
        boosting_topk(spark, built_index, POS, NEG, negative_boost=1.5, cfg=TEST_CFG)


def test_lm_quality_matches_python(spark, tiny_transcripts):
    pdf = tiny_transcripts.limit(300).toPandas().reset_index()
    pdf["doc_id"] = pdf.index
    sdf = spark.createDataFrame(pdf[["doc_id", "text"]])

    toks_of = {int(r.doc_id): tokenize_text(r.text) for r in pdf.itertuples()}
    vocab = Counter(t for ts in toks_of.values() for t in ts)
    total = sum(vocab.values())
    got = {r.doc_id: r for r in lm_quality(sdf).collect()}
    assert set(got) == set(toks_of)
    for d, toks in toks_of.items():
        assert got[d].n_tokens == len(toks)
        if not toks:
            assert got[d].avg_logprob is None
        else:
            want = sum(math.log(vocab[t] / total) for t in toks) / len(toks)
            assert math.isclose(got[d].avg_logprob, want, abs_tol=1e-9)
    # corpus has zero-token docs (empty/null text) — NULL path exercised
    assert any(not t for t in toks_of.values())
