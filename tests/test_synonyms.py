"""Query-time synonym expansion: dis-max per clause vs a Python oracle."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import bm25_topk, synonym_topk
from tests.conftest import TEST_CFG

SYN = {"w0": ["w5", "w9"], "w3": ["w7"]}
Q = "w0 w3"


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    return {r.docid: r.text for r in rows}


def _oracle(fwd, clauses, k):
    toks = {d: tokenize_text(t) for d, t in fwd.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = Counter(t for ts in toks.values() for t in set(ts))
    scores = {}
    for d, ts in toks.items():
        tf = Counter(ts)
        s, hit = 0.0, False
        for _clause, exps in clauses.items():
            best = 0.0
            for e in exps:
                if e not in tf or df[e] == 0:
                    continue
                idf = float(np.log(1.0 + (n - df[e] + 0.5) / (df[e] + 0.5)))
                norm = tf[e] / (tf[e] + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
                best = max(best, idf * norm)
            if best > 0.0:
                hit = True
                s += best
        if hit:
            scores[d] = s
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]


def test_synonym_dismax_matches_oracle(spark, built_index, fwd):
    clauses = {"w0": ["w0", "w5", "w9"], "w3": ["w3", "w7"]}
    want = _oracle(fwd, clauses, 12)
    got = synonym_topk(spark, built_index, Q, SYN, k=12, cfg=TEST_CFG).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)


def test_no_synonyms_equals_plain_bm25(spark, built_index):
    plain = bm25_topk(spark, built_index, Q, k=10, cfg=TEST_CFG).collect()
    syn = synonym_topk(spark, built_index, Q, {}, k=10, cfg=TEST_CFG).collect()
    assert [(r.docid, r.score) for r in syn] == [(r.docid, r.score) for r in plain]


def test_unknown_synonyms_ignored(spark, built_index):
    plain = bm25_topk(spark, built_index, Q, k=10, cfg=TEST_CFG).collect()
    syn = synonym_topk(
        spark, built_index, Q, {"w0": ["zzznope"], "w3": ["qqqmiss"]}, k=10, cfg=TEST_CFG
    ).collect()
    assert [(r.docid, r.score) for r in syn] == [(r.docid, r.score) for r in plain]
    assert synonym_topk(spark, built_index, "", SYN, cfg=TEST_CFG).count() == 0


def test_stored_synonym_set_roundtrip_and_query(spark, built_index):
    import pytest as _pytest

    from mysql_es_spark.functions.analyze import (
        get_synonym_set,
        put_synonym_set,
        synonym_set_as_expansions,
    )
    from mysql_es_spark.operators.query import synonym_topk

    put_synonym_set(spark, built_index, "s1", ["w0, w1", "w2 => w3"])
    put_synonym_set(spark, built_index, "s1", ["w0, w1"])  # replace
    assert get_synonym_set(spark, built_index, "s1") == ["w0, w1"]
    exp = synonym_set_as_expansions(spark, built_index, "s1")
    assert exp == {"w0": ["w1"], "w1": ["w0"]}

    # stored-name query == inline-dict query, row for row
    a = synonym_topk(spark, built_index, "w0", "s1", k=8).collect()
    b = synonym_topk(spark, built_index, "w0", {"w0": ["w1"]}, k=8).collect()
    assert [(r.docid, r.score) for r in a] == [(r.docid, r.score) for r in b]

    with _pytest.raises(KeyError):
        synonym_set_as_expansions(spark, built_index, "absent")
    with _pytest.raises(ValueError):
        put_synonym_set(spark, built_index, "bad", ["a => "])
