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
