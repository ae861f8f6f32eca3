"""Phrase suggester vs a Python oracle (candidate gen + unigram LM)."""

from __future__ import annotations

import itertools
import math
from collections import Counter

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import suggest_phrase
from tests.conftest import TEST_CFG


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


@pytest.fixture(scope="module")
def lm(spark, built_index):
    rows = spark.read.parquet(f"{built_index}/forward").select("text").collect()
    ttf = Counter(t for r in rows for t in tokenize_text(r.text))
    return ttf, sum(ttf.values())


def _oracle(lm, text, size=3, max_edits=2, per_term=8, lam=1.0):
    ttf, total = lm
    terms = tokenize_text(text)
    cand_of = []
    for t in terms:
        c = [
            (w, _lev(w, t), math.log(n / total))
            for w, n in ttf.items()
            if abs(len(w) - len(t)) <= max_edits and _lev(w, t) <= max_edits
        ]
        c.sort(key=lambda x: (x[1], -ttf[x[0]], x[0]))
        if not c:
            return []
        cand_of.append(c[:per_term])
    out = []
    for combo in itertools.product(*cand_of):
        phrase = " ".join(x[0] for x in combo)
        if phrase == " ".join(terms):
            continue
        out.append(
            (phrase, sum(x[2] - lam * x[1] for x in combo), sum(x[1] for x in combo))
        )
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:size]


@pytest.mark.parametrize("text", ["w00 w3", "w1 w22", "w7"])
def test_phrase_suggest_matches_oracle(spark, built_index, lm, text):
    want = _oracle(lm, text)
    got = suggest_phrase(spark, built_index, text, cfg=TEST_CFG).collect()
    assert [(r.phrase, r.n_edits) for r in got] == [(p, e) for p, _, e in want], text
    for r, (_, s, _) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)
    assert want, f"oracle produced nothing for {text!r} — weak test"


def test_phrase_suggest_never_echoes_input(spark, built_index, lm):
    got = suggest_phrase(spark, built_index, "w0 w1", cfg=TEST_CFG).collect()
    assert got and all(r.phrase != "w0 w1" for r in got)


def test_phrase_suggest_empty(spark, built_index):
    assert suggest_phrase(spark, built_index, "", cfg=TEST_CFG).count() == 0
    # a token with no in-range dictionary neighbor → no suggestion at all
    assert (
        suggest_phrase(
            spark, built_index, "zzzzzzzzzzzzzzzzzzzz", cfg=TEST_CFG
        ).count()
        == 0
    )


def test_phrase_suggest_rejects_long_input(spark, built_index):
    with pytest.raises(ValueError):
        suggest_phrase(spark, built_index, "w1 w2 w3 w4 w5 w6 w7", cfg=TEST_CFG)
