from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.operators import dedup, sampling


def test_hash_split_matches_python_md5(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    got = {r.doc_id: r.split for r in sampling.hash_split(df, train_pct=80).collect()}

    def py_split(i: int) -> str:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else "test"

    assert got == {i: py_split(i) for i in range(500)}
    frac = sum(1 for v in got.values() if v == "train") / len(got)
    assert 0.7 < frac < 0.9  # ~80% within hash noise


def test_hash_split_stable_under_repartition(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = dict(sampling.hash_split(df).select("doc_id", "split").collect())
    b = dict(
        sampling.hash_split(df.repartition(7, "doc_id")).select("doc_id", "split").collect()
    )
    assert a == b


@pytest.fixture()
def graph(spark):
    ids = spark.createDataFrame([(i,) for i in range(1, 13)], schema="doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], schema="id_a long, id_b long"
    )
    return ids, pairs


def test_near_dup_clusters_components(spark, graph):
    ids, pairs = graph
    got = {r.doc_id: r.cluster_id for r in dedup.near_dup_clusters(ids, pairs).collect()}
    want = {i: i for i in range(1, 13)}
    want.update({1: 1, 2: 1, 3: 1, 10: 10, 11: 10})
    assert got == want


def test_near_dup_clusters_chain_needs_iterations(spark):
    """A path graph has diameter > 1: label must propagate end to end."""
    n = 9
    ids = spark.createDataFrame([(i,) for i in range(1, n + 1)], schema="doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], schema="id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup.near_dup_clusters(ids, pairs).collect()}
    assert got == {i: 1 for i in range(1, n + 1)}
