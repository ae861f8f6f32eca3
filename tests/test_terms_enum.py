"""_terms_enum: dictionary-only prefix autocomplete, ES semantics."""

from __future__ import annotations

from collections import Counter

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import terms_enum


@pytest.fixture(scope="module")
def doc_freq(spark, built_index):
    rows = spark.read.parquet(f"{built_index}/forward").select("text").collect()
    df = Counter()
    for r in rows:
        for t in set(tokenize_text(r.text)):
            df[t] += 1
    return df


def _expected(doc_freq, prefix, size, after=None):
    terms = sorted(t for t in doc_freq if t.startswith(prefix))
    if after is not None:
        terms = [t for t in terms if t > after]
    return [(t, doc_freq[t]) for t in terms[:size]]


def test_prefix_order_and_counts(spark, built_index, doc_freq):
    got = [(r.term, r.doc_freq) for r in terms_enum(spark, built_index, "w1", size=8).collect()]
    assert got == _expected(doc_freq, "w1", 8)
    assert len(got) > 0


def test_search_after_pages_concatenate(spark, built_index, doc_freq):
    p1 = [r.term for r in terms_enum(spark, built_index, "w", size=5).collect()]
    p2 = [
        r.term
        for r in terms_enum(spark, built_index, "w", size=5, search_after=p1[-1]).collect()
    ]
    assert [t for t, _ in _expected(doc_freq, "w", 10)] == p1 + p2


def test_case_insensitive_folds_to_term_space(spark, built_index, doc_freq):
    sensitive = terms_enum(spark, built_index, "W1", size=5).collect()
    assert sensitive == []  # dictionary is lowercase; raw-byte match finds nothing
    folded = [
        (r.term, r.doc_freq)
        for r in terms_enum(spark, built_index, "W1", size=5, case_insensitive=True).collect()
    ]
    assert folded == _expected(doc_freq, "w1", 5)


def test_empty_prefix_is_first_terms(spark, built_index, doc_freq):
    got = [(r.term, r.doc_freq) for r in terms_enum(spark, built_index, "", size=3).collect()]
    assert got == _expected(doc_freq, "", 3)


def test_prefix_pushdown_reaches_parquet(spark, built_index):
    from tests.test_plan_audits import plan_of

    plan = plan_of(terms_enum(spark, built_index, "w1", size=5))
    assert "StringStartsWith(term,w1" in plan.split("PushedFilters")[1].splitlines()[0]
    # dictionary-only: postings/forward never appear in the plan
    assert "postings" not in plan and "forward" not in plan
