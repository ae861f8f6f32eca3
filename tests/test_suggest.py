"""Term suggester: dictionary-only spell correction, Lucene ranking."""

from __future__ import annotations

from collections import Counter

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import suggest_terms
from tests.conftest import TEST_CFG


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def vocab(spark, built_index):
    rows = spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    df = Counter()
    for r in rows:
        for t in set(tokenize_text(r.text)):
            df[t] += 1
    return df


def test_suggest_matches_python_oracle(spark, built_index, vocab):
    got = suggest_terms(spark, built_index, "w00", size=5, max_edits=1).collect()
    cands = [
        (t, _lev(t, "w00"), vocab[t])
        for t in vocab
        if t != "w00" and _lev(t, "w00") <= 1
    ]
    want = sorted(cands, key=lambda x: (x[1], -x[2], x[0]))[:5]
    assert [(r.suggestion, r.distance, r.df) for r in got] == want
    assert all(r.input_term == "w00" for r in got)


def test_suggest_multi_token_and_empty(spark, built_index):
    out = suggest_terms(spark, built_index, "w00 w11", size=3, max_edits=1).collect()
    assert {r.input_term for r in out} == {"w00", "w11"}
    assert all(len([r for r in out if r.input_term == t]) <= 3 for t in ("w00", "w11"))
    assert suggest_terms(spark, built_index, "", size=3).count() == 0


def test_suggest_never_suggests_the_input(spark, built_index, vocab):
    known = next(iter(vocab))
    out = suggest_terms(spark, built_index, known, size=10, max_edits=2).collect()
    assert known not in {r.suggestion for r in out}


def test_completion_contexts(spark, built_index):
    from mysql_es_spark.operators.query import suggest_completion

    fwd = spark.read.parquet(f"{built_index}/forward").select("role", "text").collect()
    roles = sorted({r.role for r in fwd if r.role})
    ctx_role = roles[0]
    want = Counter()
    for r in fwd:
        if r.role == ctx_role:
            for t in set(tokenize_text(r.text)):
                if t.startswith("w1"):
                    want[t] += 1
    got = {
        r.suggestion: r.weight
        for r in suggest_completion(
            spark, built_index, "w1", size=5, contexts={"role": [ctx_role]}
        ).collect()
    }
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == dict(top)

    # all roles admitted == the dictionary path's weights
    all_ctx = {
        r.suggestion: r.weight
        for r in suggest_completion(
            spark, built_index, "w1", size=5, contexts={"role": roles}
        ).collect()
    }
    plain = {
        r.suggestion: r.weight
        for r in suggest_completion(spark, built_index, "w1", size=5).collect()
    }
    assert all_ctx == plain

    with pytest.raises(ValueError, match="context column"):
        suggest_completion(spark, built_index, "w1", contexts={"nope": ["x"]})
