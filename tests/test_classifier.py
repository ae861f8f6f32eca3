"""NB log-odds quality classifier (CCNet/fastText-style seed-set filter):
fit term weights distributedly, score with length-invariant mean."""

from __future__ import annotations

import math

import pytest

from mysql_es_spark.operators.textstats import classifier_score, fit_log_odds

POS = [(0, "good good fine"), (1, "good clean prose here")]
NEG = [(0, "bad bad sad"), (1, "spam junk junk noise")]


@pytest.fixture(scope="module")
def weights(spark):
    p = spark.createDataFrame(POS, "doc_id long, text string")
    n = spark.createDataFrame(NEG, "doc_id long, text string")
    return fit_log_odds(p, n).cache()


def _expected_weight(term: str, alpha: float = 1.0) -> float:
    ptoks = [t for _, s in POS for t in s.split()]
    ntoks = [t for _, s in NEG for t in s.split()]
    vocab = set(ptoks) | set(ntoks)
    tfp, tfn = ptoks.count(term), ntoks.count(term)
    tp, tn, v = len(ptoks), len(ntoks), len(vocab)
    return math.log((tfp + alpha) / (tp + alpha * v)) - math.log(
        (tfn + alpha) / (tn + alpha * v)
    )


def test_weights_match_hand_computation(weights):
    got = {r.term: r.weight for r in weights.collect()}
    # every union-vocab term present, none extra
    assert set(got) == {
        "good", "fine", "clean", "prose", "here", "bad", "sad", "spam",
        "junk", "noise",
    }
    for term in got:
        assert got[term] == pytest.approx(_expected_weight(term), abs=1e-12)
    assert got["good"] > 0 > got["junk"]


def test_score_mean_and_labels(spark, weights):
    docs = spark.createDataFrame(
        [
            (10, "good fine"),            # pure positive vocabulary
            (11, "junk junk bad"),        # pure negative vocabulary
            (12, "zzz qqq"),              # OOV only → score exactly 0
            (13, ""),                     # empty → NULL score/label
            (14, None),                   # null text → NULL score/label
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in classifier_score(docs, weights).collect()}
    w = {r.term: r.weight for r in weights.collect()}
    assert got[10].score == pytest.approx((w["good"] + w["fine"]) / 2, abs=1e-12)
    assert got[10].label is True
    assert got[11].score == pytest.approx((2 * w["junk"] + w["bad"]) / 3, abs=1e-12)
    assert got[11].label is False
    # OOV tokens contribute 0 but count in the denominator
    assert got[12].score == 0.0 and got[12].label is False
    for d in (13, 14):
        assert got[d].n_tokens == 0 and got[d].score is None and got[d].label is None


def test_length_invariance(spark, weights):
    """The mean makes score independent of repetition count."""
    docs = spark.createDataFrame(
        [(1, "good bad"), (2, " ".join(["good bad"] * 50))],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.score for r in classifier_score(docs, weights).collect()}
    assert got[1] == pytest.approx(got[2], abs=1e-12)


def test_bias_shifts_threshold(spark, weights):
    docs = spark.createDataFrame([(1, "zzz")], "doc_id long, text string")
    up = classifier_score(docs, weights, bias=0.5).collect()[0]
    assert up.score == pytest.approx(0.5) and up.label is True


def test_partition_invariance(spark, weights):
    docs = spark.createDataFrame(
        [(i, f"good junk w{i % 3}") for i in range(40)], "doc_id long, text string"
    )
    a = sorted(map(tuple, classifier_score(docs, weights).collect()))
    b = sorted(map(tuple, classifier_score(docs.repartition(13), weights).collect()))
    assert a == b
