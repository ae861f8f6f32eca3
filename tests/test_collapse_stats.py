"""Field collapsing (one best hit per group) and the _stats API."""

from __future__ import annotations

import math

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import bm25_collapse_topk, index_stats
from mysql_es_spark.oracle import build_oracle_index, score_query
from tests.conftest import TEST_CFG

Q = "w0 w3"


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = (
        spark.read.parquet(f"{built_index}/forward")
        .select("docid", "role", "text")
        .collect()
    )
    return {r.docid: r for r in rows}


def test_collapse_one_per_group_in_rank_order(spark, built_index, fwd):
    oix = build_oracle_index([(d, r.text) for d, r in fwd.items()])
    full = score_query(oix, Q, k=len(fwd))
    seen: set[str] = set()
    want = []
    for d, s in full:  # ranked; first hit of each role is the group winner
        role = fwd[d].role
        if role in seen:
            continue
        seen.add(role)
        want.append((d, s, role))
    want = want[:3]
    got = bm25_collapse_topk(spark, built_index, Q, "role", k=3, cfg=TEST_CFG).collect()
    assert [(r.docid, r.role) for r in got] == [(d, role) for d, _, role in want]
    for r, (_, s, _) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)
    assert len({r.role for r in got}) == len(got)  # distinct groups


def test_collapse_empty_and_unknown(spark, built_index):
    assert bm25_collapse_topk(spark, built_index, "", "role", cfg=TEST_CFG).count() == 0
    assert (
        bm25_collapse_topk(spark, built_index, "zzznope", "role", cfg=TEST_CFG).count()
        == 0
    )


def test_index_stats(spark, built_index, fwd):
    st = index_stats(spark, built_index)
    assert st["n_docs"] == len(fwd)
    assert st["n_deleted"] == 0 and st["n_live"] == st["n_docs"]
    vocab = {t for r in fwd.values() for t in set(tokenize_text(r.text))}
    assert st["n_terms"] == len(vocab)
    assert st["waves"] >= 1 and st["n_blocks"] > 0
    for table in ("postings", "forward", "doc_lens", "term_dict"):
        assert st[f"{table}_bytes"] > 0
