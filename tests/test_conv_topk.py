"""Conversation-level ranking (has_child score_mode) over multi-turn
transcripts vs a Python oracle."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from mysql_es_spark.operators.query import conv_topk
from mysql_es_spark.oracle import build_oracle_index, score_query
from tests.conftest import TEST_CFG

Q = "w0 w3"


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = (
        spark.read.parquet(f"{built_index}/forward")
        .select("docid", "conv_id", "text")
        .collect()
    )
    return rows


def _oracle(fwd, mode, k):
    oix = build_oracle_index([(r.docid, r.text) for r in fwd])
    per_doc = dict(score_query(oix, Q, k=len(fwd)))
    conv_of = {r.docid: r.conv_id for r in fwd}
    groups = defaultdict(list)
    for d, s in per_doc.items():
        groups[conv_of[d]].append(s)
    out = []
    for c, ss in groups.items():
        v = {"max": max, "min": min, "sum": sum, "avg": lambda x: sum(x) / len(x)}[mode](ss)
        out.append((c, v, len(ss)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("mode", ["max", "sum", "avg"])
def test_conv_topk_matches_oracle(spark, built_index, fwd, mode):
    want = _oracle(fwd, mode, 8)
    got = conv_topk(spark, built_index, Q, k=8, score_mode=mode, cfg=TEST_CFG).collect()
    assert [(r.conv_id, r.n_hits) for r in got] == [(c, n) for c, _, n in want], mode
    for r, (_, s, _) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)
    # multi-turn conversations genuinely exercised
    assert any(n > 1 for _, _, n in want)


def test_conv_topk_validation_and_empty(spark, built_index):
    with pytest.raises(ValueError):
        conv_topk(spark, built_index, Q, score_mode="median", cfg=TEST_CFG)
    assert conv_topk(spark, built_index, "", cfg=TEST_CFG).count() == 0


# ---------------------------------------------------------------------------
# has_parent — the inverse direction


def _parent_oracle(fwd, mode, score):
    oix = build_oracle_index([(r.docid, r.text) for r in fwd])
    per_doc = dict(score_query(oix, Q, k=len(fwd)))
    conv_of = {r.docid: r.conv_id for r in fwd}
    groups = defaultdict(list)
    for d, s in per_doc.items():
        groups[conv_of[d]].append(s)
    agg = {"max": max, "min": min, "sum": sum, "avg": lambda x: sum(x) / len(x)}[mode]
    pscore = {c: (agg(ss) if score else 1.0) for c, ss in groups.items()}
    out = [
        (r.docid, pscore[r.conv_id]) for r in fwd if r.conv_id in pscore
    ]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("mode", ["max", "sum"])
def test_has_parent_children_carry_parent_score(spark, built_index, fwd, mode):
    from mysql_es_spark.operators.query import has_parent_topk

    want = _parent_oracle(fwd, mode, score=True)[:25]
    got = [
        (r.docid, r.score)
        for r in has_parent_topk(
            spark, built_index, Q, k=25, score_mode=mode, cfg=TEST_CFG
        ).collect()
    ]
    assert [(d, round(s, 6)) for d, s in got] == [(d, round(s, 6)) for d, s in want]


def test_has_parent_filter_semantics(spark, built_index, fwd):
    """score=False: every child of a matching parent, constant score —
    the doc set is all turns of all matching conversations."""
    from mysql_es_spark.operators.query import has_parent_topk

    want = {d for d, _s in _parent_oracle(fwd, "max", score=False)}
    got = has_parent_topk(
        spark, built_index, Q, k=len(fwd), score=False, cfg=TEST_CFG
    ).collect()
    assert {r.docid for r in got} == want
    assert {r.score for r in got} == {1.0}
