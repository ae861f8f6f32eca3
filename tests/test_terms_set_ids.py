"""terms_set (constant + per-doc threshold), ids query, and
simple_query_string's lenient degradation."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import (
    bm25_bool_topk,
    bm25_topk,
    ids_topk,
    query_string_topk,
    simple_query_string_topk,
    terms_set_topk,
)
from tests.conftest import TEST_CFG

TERMS = ["w0", "w3", "w5", "w9"]


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = (
        spark.read.parquet(f"{built_index}/forward")
        .select("docid", "doc_key", "turn_idx", "text")
        .collect()
    )
    return rows


def _scores(fwd_rows, terms):
    toks = {r.docid: tokenize_text(r.text or "") for r in fwd_rows}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = Counter(t for ts in toks.values() for t in set(ts))
    out = {}
    for d, ts in toks.items():
        tf = Counter(ts)
        s, nm = 0.0, 0
        for t in set(terms):
            if t in tf and df[t]:
                idf = float(np.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)))
                s += idf * tf[t] / (tf[t] + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
                nm += 1
        if nm:
            out[d] = (s, nm)
    return out


def test_terms_set_constant_equals_bool_should(spark, built_index):
    a = terms_set_topk(
        spark, built_index, TERMS, minimum_should_match=2, k=25, cfg=TEST_CFG
    ).collect()
    b = bm25_bool_topk(
        spark, built_index, should=" ".join(TERMS), minimum_should_match=2,
        k=25, cfg=TEST_CFG,
    ).collect()
    assert [(r.docid, round(r.score, 9)) for r in a] == [
        (r.docid, round(r.score, 9)) for r in b
    ]


def test_terms_set_per_doc_threshold(spark, built_index, fwd):
    per_doc = _scores(fwd, TERMS)
    req = {r.docid: 1 + (r.turn_idx % 3) for r in fwd}
    want = sorted(
        ((d, s) for d, (s, nm) in per_doc.items() if nm >= req[d]),
        key=lambda x: (-x[1], x[0]),
    )[:25]
    got = terms_set_topk(
        spark, built_index, TERMS, msm_expr="1 + pmod(turn_idx, 3)", k=25,
        cfg=TEST_CFG,
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, rel=1e-9)


def test_terms_set_arg_validation(spark, built_index):
    with pytest.raises(ValueError, match="exactly one"):
        terms_set_topk(spark, built_index, TERMS, cfg=TEST_CFG)
    with pytest.raises(ValueError, match="exactly one"):
        terms_set_topk(
            spark, built_index, TERMS, minimum_should_match=1,
            msm_expr="1", cfg=TEST_CFG,
        )


def test_ids_query(spark, built_index, fwd):
    keys = [fwd[3].doc_key, fwd[10].doc_key, "missing:42"]
    got = ids_topk(spark, built_index, keys, k=10, boost=2.0, cfg=TEST_CFG).collect()
    want = sorted([fwd[3].docid, fwd[10].docid])
    assert [r.docid for r in got] == want
    assert all(r.score == 2.0 for r in got)
    assert ids_topk(spark, built_index, [], cfg=TEST_CFG).count() == 0


def test_simple_query_string_translates(spark, built_index):
    a = simple_query_string_topk(
        spark, built_index, "w0 + (w3 | w5) -w9", k=15, cfg=TEST_CFG
    ).collect()
    b = query_string_topk(
        spark, built_index, "w0 AND (w3 OR w5) -w9", k=15, cfg=TEST_CFG
    ).collect()
    assert [(r.docid, round(r.score, 9)) for r in a] == [
        (r.docid, round(r.score, 9)) for r in b
    ]


def test_simple_query_string_lenient_fallback(spark, built_index):
    # unbalanced parens + stray operators: ES never errors; we degrade to
    # a disjunctive bag over the non-negated words
    got = simple_query_string_topk(
        spark, built_index, "w0 (( w3 OR -w9 +", k=12, cfg=TEST_CFG
    ).collect()
    bag = bm25_topk(spark, built_index, "w0 w3 OR", k=12, cfg=TEST_CFG).collect()
    assert [(r.docid, round(r.score, 9)) for r in got] == [
        (r.docid, round(r.score, 9)) for r in bag
    ]
    # pure-negative: nothing positive to match
    assert (
        simple_query_string_topk(spark, built_index, "-w0 -w3", cfg=TEST_CFG).count()
        == 0
    )
