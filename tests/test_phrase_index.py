"""Indexed phrase queries (match_phrase) over a positional index: doc-set
equality with a pure-Python reference, BM25 score identity with the NumPy
oracle, occurrence counts, and pruning invariants."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import bm25_topk, phrase_topk
from mysql_es_spark.oracle import build_oracle_index, score_query
from mysql_es_spark.plans.build import build_index

POS_CFG = IndexConfig(
    n_buckets=4, wave_size=2, salt_docs=64, term_buckets=4, block_size=4,
    with_positions=True,
)

DOCS = [
    ("c0", "fast table scan with fast table merge"),  # 2 hits of "fast table"
    ("c1", "the fast table"),
    ("c2", "fast x table"),  # not consecutive
    ("c3", "table fast"),  # wrong order
    ("c4", "a b a b a"),  # overlapping repeats
    ("c5", "completely unrelated words here"),
    ("c6", "fast\n Table, SCAN!"),  # normalization: newline/case/punct
]


def _py_phrase_hits(text: str, phrase: str) -> int:
    toks, ph = tokenize_text(text), tokenize_text(phrase)
    return sum(
        1
        for i in range(len(toks) - len(ph) + 1)
        if toks[i : i + len(ph)] == ph
    )


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("posix") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, POS_CFG)
    return d


def _phrase(spark, ix, q, k=20):
    rows = phrase_topk(spark, ix, q, k=k, cfg=POS_CFG, with_keys=True).collect()
    return {r.conv_id: (r.n_hits, r.score) for r in rows}


@pytest.mark.parametrize(
    "q",
    ["fast table", "fast table scan", "a b a", "b a b", "the fast table", "table"],
)
def test_phrase_matches_python_reference(spark, pos_index, q):
    got = _phrase(spark, pos_index, q)
    want = {cid: _py_phrase_hits(text, q) for cid, text in DOCS}
    want = {cid: n for cid, n in want.items() if n > 0}
    assert {c: h for c, (h, _s) in got.items()} == want


def test_phrase_scores_match_oracle(spark, pos_index):
    """Matching docs are BM25-scored over the phrase's unique terms with
    corpus-global idf — identical to the oracle's scoring of those docs."""
    fwd = spark.read.parquet(f"{pos_index}/forward").select(
        "docid", "conv_id", "text"
    ).collect()
    oracle = build_oracle_index([(r.docid, r.text) for r in fwd])
    conv_of = {r.docid: r.conv_id for r in fwd}
    got = _phrase(spark, pos_index, "fast table")
    full = dict(score_query(oracle, "fast table", oracle.n_docs))
    want = {
        conv_of[d]: s
        for d, s in full.items()
        if conv_of[d] in got
    }
    assert set(got) == set(want)
    for cid, (_h, s) in got.items():
        assert math.isclose(s, want[cid], abs_tol=1e-9), (cid, s, want[cid])


def test_phrase_empty_and_absent(spark, pos_index):
    assert phrase_topk(spark, pos_index, "", cfg=POS_CFG).count() == 0
    assert phrase_topk(spark, pos_index, "zzz qqq", cfg=POS_CFG).count() == 0
    assert phrase_topk(spark, pos_index, "unrelated fast", cfg=POS_CFG).count() == 0


def test_positional_index_still_rank_identical_bm25(spark, pos_index):
    """Positions are additive: the BM25 paths on a positional index are
    unchanged (same blocks, pos_blob simply unread)."""
    fwd = spark.read.parquet(f"{pos_index}/forward").select("docid", "text").collect()
    oracle = build_oracle_index([(r.docid, r.text) for r in fwd])
    got = [
        (r.docid, r.score)
        for r in bm25_topk(spark, pos_index, "fast table", k=10, cfg=POS_CFG, mode="pruned").collect()
    ]
    want = score_query(oracle, "fast table", 10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert math.isclose(a, b, abs_tol=1e-9)


def test_multiturn_phrase(spark, tmp_path_factory):
    """Positions reset per turn (each turn is its own doc): a phrase never
    matches across turn boundaries."""
    d = str(tmp_path_factory.mktemp("posix2") / "ix")
    rows = [
        ("m0", 0, "user", "ends with fast", None, datetime(2026, 1, 1)),
        ("m0", 1, "assistant", "table starts here", None, datetime(2026, 1, 1)),
        ("m1", 0, "user", "has fast table inside", None, datetime(2026, 1, 1)),
    ]
    frame = spark.createDataFrame(
        rows,
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, frame, d, POS_CFG)
    got = phrase_topk(spark, d, "fast table", k=10, cfg=POS_CFG, with_keys=True).collect()
    assert {(r.conv_id, r.turn_idx) for r in got} == {("m1", 0)}
