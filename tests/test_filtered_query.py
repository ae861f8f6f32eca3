"""Filter-context BM25 + search-result aggregations.

ES bool{must: match, filter: …} semantics: the structural predicate masks
candidates but never changes scores (idf/avgdl stay corpus-global), so
the filtered top-k must equal the full ranking with non-matching docs
struck out. match_aggregate must count ALL matching docs, not top-k.
"""

from __future__ import annotations

import math

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.oracle import build_oracle_index, score_query
from mysql_es_spark.operators.query import (
    bm25_filtered_topk,
    bm25_topk,
    match_aggregate,
    query_terms,
)
from tests.conftest import TEST_CFG

Q = "w0 w3"


@pytest.fixture(scope="module")
def fwd_rows(spark, built_index):
    return (
        spark.read.parquet(f"{built_index}/forward")
        .select("docid", "role", "text")
        .collect()
    )


@pytest.fixture(scope="module")
def oracle_ix(fwd_rows):
    return build_oracle_index([(r.docid, r.text) for r in fwd_rows])


def test_filtered_rank_identity(spark, built_index, fwd_rows, oracle_ix):
    allowed = {r.docid for r in fwd_rows if r.role == "assistant"}
    full = score_query(oracle_ix, Q, k=len(fwd_rows))
    want = [(d, s) for d, s in full if d in allowed][:15]
    got = [
        (r.docid, r.score)
        for r in bm25_filtered_topk(
            spark, built_index, Q, "role = 'assistant'", k=15, cfg=TEST_CFG
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, abs_tol=1e-9)


def test_filter_true_equals_unfiltered(spark, built_index):
    got = bm25_filtered_topk(
        spark, built_index, Q, "turn_idx >= 0", k=10, cfg=TEST_CFG
    ).collect()
    want = bm25_topk(spark, built_index, Q, k=10, cfg=TEST_CFG, mode="simple").collect()
    assert [(r.docid, r.score) for r in got] == [(r.docid, r.score) for r in want]


def test_filter_none_empty(spark, built_index):
    out = bm25_filtered_topk(
        spark, built_index, Q, "role = 'nosuchrole'", k=10, cfg=TEST_CFG
    ).collect()
    assert out == []


def test_filtered_with_keys_respects_filter(spark, built_index):
    rows = bm25_filtered_topk(
        spark, built_index, Q, "role = 'tool'", k=10, cfg=TEST_CFG, with_keys=True
    ).collect()
    assert rows  # the 10% tool turns still match head terms
    terms = set(query_terms(Q))
    for r in rows:
        assert terms & set(tokenize_text(r.text))


def test_match_aggregate_counts_all_matches(spark, built_index, fwd_rows):
    terms = set(query_terms(Q))
    per_role: dict[str, list[int]] = {}
    for r in fwd_rows:
        toks = tokenize_text(r.text)
        if terms & set(toks):
            per_role.setdefault(r.role, []).append(len(toks))
    got = {
        r.role: (r.n_docs, r.avg_dl)
        for r in match_aggregate(spark, built_index, Q, ["role"], cfg=TEST_CFG).collect()
    }
    assert set(got) == set(per_role)
    for role, dls in per_role.items():
        n, avg = got[role]
        assert n == len(dls)
        assert math.isclose(avg, sum(dls) / len(dls), abs_tol=1e-9)


def test_match_aggregate_unknown_term_empty(spark, built_index):
    out = match_aggregate(
        spark, built_index, "zzznotaterm", ["role"], cfg=TEST_CFG
    ).collect()
    assert out == []


def test_match_aggregate_runtime_field(spark, built_index):
    """ES runtime_mappings: bucket by a query-time computed field."""
    from collections import Counter

    from mysql_es_spark.functions.analyze import tokenize_text
    from mysql_es_spark.operators.query import bm25_topk, match_aggregate

    fwd = spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    dls = {
        r.docid: r.dl
        for r in spark.read.parquet(f"{built_index}/doc_lens").collect()
    }
    matched = {
        r.docid
        for r in bm25_topk(
            spark, built_index, "w0 w3", k=10**6, cfg=TEST_CFG, mode="simple"
        ).collect()
    }
    text_of = {r.docid: r.text for r in fwd}
    want = Counter(
        str(len(text_of[d] or "") // 50 * 50) for d in matched
    )
    got = match_aggregate(
        spark, built_index, "w0 w3", ["len_bucket"], cfg=TEST_CFG,
        runtime={"len_bucket": "cast(floor(length(text) / 50) * 50 as long)"},
    ).collect()
    assert {r.len_bucket: r.n_docs for r in got} == dict(want)
    for r in got:
        docs_in = [d for d in matched if len(text_of[d] or "") // 50 * 50 == int(r.len_bucket)]
        assert r.avg_dl == pytest.approx(sum(dls[d] for d in docs_in) / len(docs_in))
