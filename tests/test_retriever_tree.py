"""Retriever-tree compiler: nested rrf/linear/rescorer composition must
equal the manual composition of the underlying fuse primitives."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.operators.fusion import (
    linear_fuse,
    retriever_tree,
    rrf_fuse,
    with_rank,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, s double")


@pytest.fixture()
def leaves(spark):
    a = _frame(spark, [(1, 9.0), (2, 7.0), (3, 5.0), (4, 3.0)])
    b = _frame(spark, [(3, 0.9), (5, 0.8), (1, 0.7), (6, 0.2)])
    c = _frame(spark, [(2, 4.0), (6, 3.5), (7, 1.0)])
    return a, b, c


def test_rrf_node_equals_manual(spark, leaves):
    a, b, _ = leaves
    tree = retriever_tree(
        {"rrf": {"retrievers": [{"retriever": a}, {"retriever": b}],
                 "rank_constant": 60, "rank_window_size": 10}},
        k=5, score_decimals=6,
    ).collect()
    order = [F.round(F.col("s"), 6).desc(), F.col("doc_id").asc()]
    manual = rrf_fuse(
        [with_rank(a.orderBy(*order).limit(10), order),
         with_rank(b.orderBy(*order).limit(10), order)],
        k=5, rrf_k=60, score_decimals=6,
    ).collect()
    assert [(r.doc_id, round(r.s, 9)) for r in tree] == [
        (r.doc_id, round(r.score, 9)) for r in manual
    ]


def test_nested_linear_inside_rrf(spark, leaves):
    a, b, c = leaves
    inner = {"linear": {"retrievers": [{"retriever": b}, {"retriever": c}],
                        "weights": [0.5, 2.0], "normalize": "minmax",
                        "rank_window_size": 10}}
    tree = retriever_tree(
        {"rrf": {"retrievers": [{"retriever": a}, inner], "rank_window_size": 10}},
        k=6, score_decimals=6,
    ).collect()
    order = [F.round(F.col("s"), 6).desc(), F.col("doc_id").asc()]
    lin = linear_fuse(
        [(b, 0.5), (c, 2.0)], k=10, score_decimals=6, normalize="minmax"
    ).select("doc_id", F.col("score").alias("s"))
    manual = rrf_fuse(
        [with_rank(a.orderBy(*order).limit(10), order),
         with_rank(lin.orderBy(*order).limit(10), order)],
        k=6, rrf_k=60, score_decimals=6,
    ).collect()
    assert [(r.doc_id, round(r.s, 9)) for r in tree] == [
        (r.doc_id, round(r.score, 9)) for r in manual
    ]


def test_rescorer_window_contract(spark, leaves):
    a, _, _ = leaves

    def invert(window_df):
        # re-score with the negated score plus an id the child never saw
        extra = _frame(spark, [(99, 100.0)])
        return window_df.select("doc_id", (-F.col("s")).alias("s")).unionByName(extra)

    got = retriever_tree(
        {"rescorer": {"retriever": {"retriever": a}, "rescore": invert,
                      "rank_window_size": 2}},
        k=5,
    ).collect()
    # window=2 keeps only docs 1,2; rescored to -9,-7 → order (2, 1); 99 dropped
    assert [(r.doc_id, r.s) for r in got] == [(2, -7.0), (1, -9.0)]


def test_validation(spark, leaves):
    a, b, _ = leaves
    with pytest.raises(ValueError):
        retriever_tree({"bogus": {}}, k=3)
    with pytest.raises(ValueError):
        retriever_tree({"rrf": {}, "linear": {}}, k=3)
    with pytest.raises(ValueError):
        retriever_tree(
            {"linear": {"retrievers": [{"retriever": a}, {"retriever": b}],
                        "weights": [1.0]}},
            k=3,
        )


def test_rule_node_pins_and_excludes(spark, leaves):
    a, _b, _c = leaves
    rules = [
        {"type": "pinned", "ids": ["4"],
         "criteria": [{"type": "contains", "metadata": "user_query", "values": ["foo"]}]},
        {"type": "exclude", "ids": ["2"], "criteria": [{"type": "always"}]},
        {"type": "pinned", "ids": ["9"],
         "criteria": [{"type": "exact", "metadata": "user_query", "values": ["zzz"]}]},
    ]
    out = retriever_tree(
        {"rule": {"retriever": {"retriever": a}, "rules": rules,
                  "metadata": {"user_query": "a foo query"}}},
        k=4,
    ).collect()
    ids = [r.doc_id for r in out]
    assert ids == [4, 1, 3]          # pin first, 2 excluded, organic order kept
    assert out[0].s >= 1.0e6 - 1

    # ghost pin: trusted without a corpus frame, dropped with one
    ghost = [{"type": "pinned", "ids": ["42"], "criteria": [{"type": "always"}]}]
    ids_trusted = [
        r.doc_id
        for r in retriever_tree(
            {"rule": {"retriever": {"retriever": a}, "rules": ghost, "metadata": {}}},
            k=5,
        ).collect()
    ]
    assert ids_trusted[0] == 42
    ids_checked = [
        r.doc_id
        for r in retriever_tree(
            {"rule": {"retriever": {"retriever": a}, "rules": ghost,
                      "metadata": {}, "corpus": a.select("doc_id")}},
            k=5,
        ).collect()
    ]
    assert 42 not in ids_checked


def test_rule_node_composes_under_rrf(spark, leaves):
    a, b, _ = leaves
    ruled = {"rule": {"retriever": {"retriever": a},
                      "rules": [{"type": "exclude", "ids": ["1"],
                                 "criteria": [{"type": "always"}]}],
                      "metadata": {}}}
    fused = retriever_tree(
        {"rrf": {"retrievers": [ruled, {"retriever": b}], "rank_window_size": 10}},
        k=6, score_decimals=6,
    ).collect()
    ids = [r.doc_id for r in fused]
    assert 1 in ids  # excluded only from the ruled child; b still surfaces it
    # but doc 1 gets only b's rank contribution: weaker than doc 3 (both lists)
    pos = {d: i for i, d in enumerate(ids)}
    assert pos[3] < pos[1]
