"""Batch multi-query search (_msearch): per-query results identical to
running bm25_topk one query at a time; shared terms decoded once."""

from __future__ import annotations

import math

import pytest

from mysql_es_spark.operators.query import bm25_topk, bm25_topk_multi
from tests.conftest import TEST_CFG

QS = {
    "q1": "w0 w3",
    "q2": "w1",
    "q3": "w0 w5 zzznope",  # overlaps q1 on w0; one unknown term
    "q4": "zzznope",  # nothing known → no rows for this qid
}


def test_multi_equals_single_query_loop(spark, built_index):
    out = bm25_topk_multi(spark, built_index, QS, k=7, cfg=TEST_CFG).collect()
    by_qid: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.qid, r.rank)):
        by_qid.setdefault(r.qid, []).append(r)
    assert set(by_qid) == {"q1", "q2", "q3"}  # q4 absent, not erroring
    for qid, q in QS.items():
        want = bm25_topk(spark, built_index, q, k=7, cfg=TEST_CFG).collect()
        got = by_qid.get(qid, [])
        assert [r.docid for r in got] == [r.docid for r in want], qid
        for g, w in zip(got, want):
            assert math.isclose(g.score, w.score, abs_tol=1e-9)
        assert [r.rank for r in got] == list(range(1, len(got) + 1))


def test_multi_masks_deletes(spark, tiny_transcripts, tmp_path_factory):
    import shutil

    from mysql_es_spark.functions.analyze import tokenize_text
    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.plans.deletes import delete_by_query

    d = str(tmp_path_factory.mktemp("msdel") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, tiny_transcripts, d, TEST_CFG)
    rows = spark.read.parquet(f"{d}/forward").select("docid", "text").collect()
    delete_by_query(spark, d, "w2", cfg=TEST_CFG)
    deleted = {r.docid for r in rows if "w2" in set(tokenize_text(r.text))}
    out = bm25_topk_multi(spark, d, {"a": "w0 w2", "b": "w3"}, k=10_000, cfg=TEST_CFG)
    assert not ({r.docid for r in out.collect()} & deleted)


def test_multi_empty_inputs(spark, built_index):
    assert bm25_topk_multi(spark, built_index, {}, k=5, cfg=TEST_CFG).count() == 0
    assert (
        bm25_topk_multi(spark, built_index, {"a": ""}, k=5, cfg=TEST_CFG).count() == 0
    )


def test_multi_large_batch_join_path(spark, built_index, monkeypatch):
    """Past the threshold, term selection flips from an In() filter to a
    broadcast semi-join; results must be identical on both paths."""
    import mysql_es_spark.operators.query as qmod

    qs = {f"q{i}": f"zz{i} w{i % 12}" for i in range(40)}
    isin = {
        (r.qid, r.rank): r.docid
        for r in qmod.bm25_topk_multi(spark, built_index, qs, k=3, cfg=TEST_CFG).collect()
    }
    monkeypatch.setattr(qmod, "_MSEARCH_ISIN_MAX", 1)  # force the join path
    joined = {
        (r.qid, r.rank): r.docid
        for r in qmod.bm25_topk_multi(spark, built_index, qs, k=3, cfg=TEST_CFG).collect()
    }
    assert isin == joined and isin
