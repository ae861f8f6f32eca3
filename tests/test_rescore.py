"""Rescore window: phrase-precise reranking of the BM25 top-N, ES
score_mode combinations, window restriction, and O(window) positions I/O."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import bm25_topk, phrase_topk, rescore_topk
from mysql_es_spark.oracle import build_oracle_index, score_query
from mysql_es_spark.plans.build import build_index

CFG = IndexConfig(
    n_buckets=4, wave_size=2, salt_docs=64, term_buckets=4, block_size=4,
    with_positions=True,
)


@pytest.fixture(scope="module")
def ix(spark, tiny_transcripts, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rescoreix") / "ix")
    build_index(spark, tiny_transcripts, d, CFG)
    return d


@pytest.fixture(scope="module")
def fwd(spark, ix):
    rows = spark.read.parquet(f"{ix}/forward").select("docid", "text").collect()
    return {r.docid: r.text for r in rows}


def _py_phrase_match(text: str, phrase: str) -> bool:
    toks, ph = tokenize_text(text), tokenize_text(phrase)
    return any(toks[i : i + len(ph)] == ph for i in range(len(toks) - len(ph) + 1))


def _oracle_rescore(fwd, query, phrase, k, window, qw, rw, mode):
    oix = build_oracle_index(list(fwd.items()))
    base = score_query(oix, query, k=window)
    ph_scores = dict(score_query(oix, phrase, k=len(fwd)))
    out = []
    for d, s in base:
        if _py_phrase_match(fwd[d], phrase):
            q, r = qw * s, rw * ph_scores[d]
            c = {
                "total": q + r,
                "multiply": q * r,
                "avg": (q + r) / 2.0,
                "max": max(q, r),
                "min": min(q, r),
            }[mode]
        else:
            c = qw * s
        out.append((d, c))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("mode", ["total", "multiply", "max"])
def test_rescore_matches_oracle(spark, ix, fwd, mode):
    want = _oracle_rescore(fwd, "w0 w3 w5", "w0 w1", 10, 40, 1.0, 2.0, mode)
    got = rescore_topk(
        spark, ix, "w0 w3 w5", "w0 w1", k=10, window_size=40,
        rescore_weight=2.0, score_mode=mode, cfg=CFG,
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want], mode
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)


def test_rescore_only_touches_window(spark, ix, fwd):
    """A phrase match outside the BM25 top-N window must not enter the
    result — rescore reorders the window, never widens it."""
    window = 5
    base = [r.docid for r in bm25_topk(spark, ix, "w0 w3", k=window, cfg=CFG).collect()]
    got = rescore_topk(
        spark, ix, "w0 w3", "w1 w2", k=window, window_size=window, cfg=CFG
    ).collect()
    assert {r.docid for r in got} == set(base)


def test_rescore_validation_and_empty(spark, ix):
    with pytest.raises(ValueError):
        rescore_topk(spark, ix, "w0", "w0 w1", score_mode="sum", cfg=CFG)
    assert rescore_topk(spark, ix, "zzznope", "w0 w1", cfg=CFG).count() == 0


def test_candidate_restricted_phrase_equals_filtered_full(spark, ix, fwd):
    full = phrase_topk(spark, ix, "w0 w1", k=10_000, cfg=CFG).collect()
    cand = [r.docid for r in full][:7] + [max(fwd) + 999]  # 7 real + 1 bogus
    got = phrase_topk(spark, ix, "w0 w1", k=10_000, cfg=CFG, candidates=cand).collect()
    want = [(r.docid, r.score) for r in full if r.docid in set(cand)]
    assert [(r.docid, r.score) for r in got] == want
