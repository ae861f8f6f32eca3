"""function_score: BM25 combined with doc-field functions, vs a Python
oracle; boost modes; pruning-off correctness (every matched doc re-ranked)."""

from __future__ import annotations

import math

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import (
    field_value_factor,
    function_score_topk,
    gauss_decay,
)
from mysql_es_spark.oracle import build_oracle_index, score_query
from tests.conftest import TEST_CFG

Q = "w0 w3"


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = (
        spark.read.parquet(f"{built_index}/forward")
        .select("docid", "text", "ts", "turn_idx")
        .collect()
    )
    return {r.docid: r for r in rows}


@pytest.fixture(scope="module")
def base_scores(fwd):
    oix = build_oracle_index([(d, r.text) for d, r in fwd.items()])
    return dict(score_query(oix, Q, k=len(fwd)))


def test_gauss_recency_multiply(spark, built_index, fwd, base_scores):
    origin = "2026-01-05"
    from datetime import date

    def decay(d):
        delta = abs((fwd[d].ts.date() - date(2026, 1, 5)).days)
        return 0.5 ** ((delta / 3.0) ** 2)

    want = sorted(
        ((d, s * decay(d)) for d, s in base_scores.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = function_score_topk(
        spark, built_index, Q, gauss_decay("ts", origin, 3.0), k=10, cfg=TEST_CFG
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, rel_tol=1e-12)


def test_field_value_factor_sum_and_replace(spark, built_index, fwd, base_scores):
    fvf = lambda d: math.log(1.0 + 2.0 * fwd[d].turn_idx)
    want = sorted(
        ((d, s + fvf(d)) for d, s in base_scores.items()), key=lambda x: (-x[1], x[0])
    )[:8]
    got = function_score_topk(
        spark, built_index, Q, field_value_factor("turn_idx", 2.0), k=8,
        boost_mode="sum", cfg=TEST_CFG,
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, rel_tol=1e-12)

    rep = function_score_topk(
        spark, built_index, Q, field_value_factor("turn_idx", 2.0), k=5,
        boost_mode="replace", cfg=TEST_CFG,
    ).collect()
    want_rep = sorted(
        ((d, fvf(d)) for d in base_scores), key=lambda x: (-x[1], x[0])
    )[:5]
    assert [r.docid for r in rep] == [d for d, _ in want_rep]


def test_sql_string_modifier_and_validation(spark, built_index, base_scores):
    got = function_score_topk(
        spark, built_index, Q, "1.0", k=5, cfg=TEST_CFG
    ).collect()
    want = sorted(base_scores.items(), key=lambda x: (-x[1], x[0]))[:5]
    assert [r.docid for r in got] == [d for d, _ in want]
    with pytest.raises(ValueError):
        function_score_topk(spark, built_index, Q, "1.0", boost_mode="max", cfg=TEST_CFG)
    assert function_score_topk(spark, built_index, "", "1.0", cfg=TEST_CFG).count() == 0


def test_rank_feature_saturation(spark, built_index, fwd, base_scores):
    from mysql_es_spark.operators.query import rank_feature_topk

    sat = lambda d: 1.5 * (len(fwd[d].text) / (len(fwd[d].text) + 40.0))
    want = sorted(
        ((d, s + sat(d)) for d, s in base_scores.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = rank_feature_topk(
        spark, built_index, Q, feature="length(text)", function="saturation",
        pivot=40.0, boost=1.5, k=10, cfg=TEST_CFG,
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, rel_tol=1e-12)


def test_rank_feature_log_and_sigmoid(spark, built_index, fwd, base_scores):
    from mysql_es_spark.operators.query import rank_feature_topk

    lg = lambda d: math.log(1.0 + 0.1 * len(fwd[d].text))
    want = sorted(
        ((d, s + lg(d)) for d, s in base_scores.items()),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    got = rank_feature_topk(
        spark, built_index, Q, feature="length(text)", function="log",
        scaling_factor=0.1, k=5, cfg=TEST_CFG,
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]

    sig = lambda d: (len(fwd[d].text) ** 2.0) / (len(fwd[d].text) ** 2.0 + 50.0**2.0)
    want = sorted(
        ((d, s + sig(d)) for d, s in base_scores.items()),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    got = rank_feature_topk(
        spark, built_index, Q, feature="length(text)", function="sigmoid",
        pivot=50.0, exponent=2.0, k=5, cfg=TEST_CFG,
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, rel_tol=1e-12)
    with pytest.raises(ValueError):
        rank_feature_topk(spark, built_index, Q, function="nope", cfg=TEST_CFG)
    with pytest.raises(ValueError):
        rank_feature_topk(spark, built_index, Q, function="saturation", pivot=0, cfg=TEST_CFG)


def test_rank_feature_negative_feature_clamped(spark, built_index, fwd, base_scores):
    """A feature expression that can go negative must not break the
    additive_max=boost upper bound: ES's rank_feature stores positive
    values only, and rank_feature_topk enforces that contract by clamping
    f = max(f, 0). With f < -pivot, f/(f+pivot) > 1 would otherwise
    exceed the per-salt bound and the pruned path could drop true top-k
    docs. Oracle applies the same clamp."""
    from mysql_es_spark.operators.query import rank_feature_topk

    # length(text) - C straddles zero across the corpus
    cut = sorted(len(r.text or "") for r in fwd.values())[len(fwd) // 2]
    feat = f"length(text) - {cut}"
    sat = lambda d: 2.0 * (
        max(len(fwd[d].text or "") - cut, 0.0)
        / (max(len(fwd[d].text or "") - cut, 0.0) + 10.0)
    )
    want = sorted(
        ((d, s + sat(d)) for d, s in base_scores.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = rank_feature_topk(
        spark, built_index, Q, feature=feat, function="saturation",
        pivot=10.0, boost=2.0, k=10, cfg=TEST_CFG,
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, rel_tol=1e-12)
