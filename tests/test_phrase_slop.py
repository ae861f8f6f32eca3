"""Ordered-proximity phrase queries (match_phrase slop / SpanNear
inOrder): DP matcher vs a brute-force Python reference, slop=0 identity
with the exact-adjacency path, and cross-salt coverage."""

from __future__ import annotations

from datetime import datetime
from itertools import product

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import phrase_topk
from mysql_es_spark.plans.build import build_index

# salt_docs=4 forces matches to straddle many salts; block_size=4 many blocks
CFG = IndexConfig(
    n_buckets=2, wave_size=2, salt_docs=4, term_buckets=4, block_size=4,
    with_positions=True,
)

DOCS = [
    ("c0", "fast table scan"),                      # exact
    ("c1", "fast and table"),                       # 1 gap
    ("c2", "fast x y table"),                       # 2 gaps
    ("c3", "table fast"),                           # wrong order — never
    ("c4", "fast fast table table"),                # repeats, multiple chains
    ("c5", "fast a b c d table"),                   # 4 gaps
    ("c6", "x fast y table z fast table"),          # two separate regions
    ("c7", "fast table fast table"),                # overlapping matches
    ("c8", "completely unrelated words"),
    ("c9", "one fast two table three scan four"),   # 3-term with gaps
]


def _py_slop_hits(text: str, phrase: str, slop: int) -> int:
    """End positions q_m admitting in-order positions q1<...<qm of the
    phrase terms with (qm - q1) - (m-1) <= slop."""
    toks, ph = tokenize_text(text), tokenize_text(phrase)
    occ = [[i for i, t in enumerate(toks) if t == p] for p in ph]
    ends = set()
    for combo in product(*occ):
        if all(a < b for a, b in zip(combo, combo[1:])) and (
            combo[-1] - combo[0] - (len(ph) - 1) <= slop
        ):
            ends.add(combo[-1])
    return len(ends)


@pytest.fixture(scope="module")
def slop_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("slop") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, CFG)
    return d


def _run(spark, ix, q, slop):
    rows = phrase_topk(spark, ix, q, k=50, cfg=CFG, with_keys=True, slop=slop).collect()
    return {r.conv_id: r.n_hits for r in rows}


@pytest.mark.parametrize("slop", [0, 1, 2, 4])
@pytest.mark.parametrize("q", ["fast table", "fast table scan"])
def test_slop_matches_python_reference(spark, slop_index, q, slop):
    got = _run(spark, slop_index, q, slop)
    want = {c: _py_slop_hits(t, q, slop) for c, t in DOCS}
    want = {c: n for c, n in want.items() if n > 0}
    assert got == want


def test_slop_zero_equals_exact_path(spark, slop_index):
    """slop=0 (DP disabled, intersect path) and slop via DP with a huge
    corpus-order window agree where the contracts coincide."""
    exact = {
        (r.conv_id, r.n_hits, round(r.score, 9))
        for r in phrase_topk(
            spark, slop_index, "fast table", k=50, cfg=CFG, with_keys=True
        ).collect()
    }
    want = {c: _py_slop_hits(t, "fast table", 0) for c, t in DOCS}
    assert {c for c, _n, _s in exact} == {c for c, n in want.items() if n > 0}
    assert {c: n for c, n, _s in exact} == {c: n for c, n in want.items() if n > 0}


def test_slop_scores_are_bm25_over_terms(spark, slop_index):
    """A doc matching at slop=3 but not slop=0 gets the same BM25 score
    it would get from the exact phrase path had it matched — scoring
    depends on the term stats, not the gap width."""
    s3 = {
        r.conv_id: round(r.score, 9)
        for r in phrase_topk(
            spark, slop_index, "fast table", k=50, cfg=CFG, with_keys=True, slop=3
        ).collect()
    }
    s0 = {
        r.conv_id: round(r.score, 9)
        for r in phrase_topk(
            spark, slop_index, "fast table", k=50, cfg=CFG, with_keys=True
        ).collect()
    }
    for cid, score in s0.items():
        assert s3[cid] == score
