"""_query_rules: criteria matching, pin/exclude application, storage."""

from __future__ import annotations

import pytest

from mysql_es_spark.operators.rules import (
    get_ruleset,
    matching_actions,
    put_ruleset,
    rules_topk,
    validate_ruleset,
)


def test_criteria_semantics():
    rules = [
        {
            "type": "pinned",
            "ids": ["a"],
            "criteria": [{"type": "exact", "metadata": "user_query", "values": ["foo"]}],
        },
        {
            "type": "pinned",
            "ids": ["b"],
            "criteria": [
                {"type": "contains", "metadata": "user_query", "values": ["oo"]},
                {"type": "prefix", "metadata": "lang", "values": ["e"]},
            ],
        },
        {
            "type": "exclude",
            "ids": ["c"],
            "criteria": [{"type": "suffix", "metadata": "user_query", "values": ["bar"]}],
        },
        {"type": "pinned", "ids": ["d"], "criteria": [{"type": "always"}]},
    ]
    validate_ruleset(rules)
    pins, excl = matching_actions(rules, {"user_query": "foo", "lang": "en"})
    assert pins == ["a", "b", "d"] and excl == set()
    pins, excl = matching_actions(rules, {"user_query": "xbar"})
    assert pins == ["d"] and excl == {"c"}
    # ALL criteria of a rule must match
    pins, _ = matching_actions(rules, {"user_query": "foo", "lang": "fr"})
    assert pins == ["a", "d"]
    # a doc both pinned and excluded is excluded
    both = [
        {"type": "pinned", "ids": ["x"], "criteria": [{"type": "always"}]},
        {"type": "exclude", "ids": ["x"], "criteria": [{"type": "always"}]},
    ]
    pins, excl = matching_actions(both, {})
    assert pins == [] and excl == {"x"}


def test_validation_rejects():
    for bad in (
        [],
        [{"type": "boost", "ids": ["a"], "criteria": [{"type": "always"}]}],
        [{"type": "pinned", "ids": [], "criteria": [{"type": "always"}]}],
        [{"type": "pinned", "ids": ["a"], "criteria": []}],
        [{"type": "pinned", "ids": ["a"], "criteria": [{"type": "fuzzyish"}]}],
        [{"type": "pinned", "ids": ["a"], "criteria": [{"type": "exact"}]}],
    ):
        with pytest.raises(ValueError):
            validate_ruleset(bad)


def test_rules_topk_pins_and_excludes(spark, built_index):
    from mysql_es_spark.operators.query import bm25_topk

    base = bm25_topk(
        spark, built_index, "w0 w3", k=8, mode="simple", with_keys=True
    ).collect()
    keys = [r.doc_key for r in base]
    pin_key, excl_key = keys[5], keys[1]
    rules = [
        {
            "type": "pinned",
            "ids": [pin_key],
            "criteria": [{"type": "contains", "metadata": "user_query", "values": ["w0"]}],
        },
        {
            "type": "exclude",
            "ids": [excl_key],
            "criteria": [{"type": "always"}],
        },
        {
            "type": "pinned",
            "ids": ["nope:999"],
            "criteria": [{"type": "exact", "metadata": "user_query", "values": ["zzz"]}],
        },
    ]
    out = rules_topk(
        spark, built_index, "w0 w3", rules, k=5, with_keys=True
    ).collect()
    got = [r.doc_key for r in out]
    # pinned first, excluded gone, organic order preserved after
    want = [pin_key] + [k2 for k2 in keys if k2 not in (pin_key, excl_key)][:4]
    assert got == want
    assert out[0].score >= 1.0e6 - 1  # deterministic pinned score

    # no rule matches → plain BM25
    out2 = rules_topk(
        spark, built_index, "w0 w3",
        [rules[2]], k=5, with_keys=True,
    ).collect()
    assert [r.doc_key for r in out2] == keys[:5]


def test_ruleset_storage_roundtrip(spark, built_index):
    rules = [
        {"type": "pinned", "ids": ["a:0"], "criteria": [{"type": "always"}]}
    ]
    put_ruleset(spark, built_index, "merch", rules)
    put_ruleset(
        spark, built_index, "merch",
        [{"type": "exclude", "ids": ["b:0"], "criteria": [{"type": "always"}]}],
    )  # replace
    got = get_ruleset(spark, built_index, "merch")
    assert got[0]["type"] == "exclude"
    with pytest.raises(KeyError):
        get_ruleset(spark, built_index, "absent")
