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


def test_stratified_sample_matches_python_oracle(spark):
    import hashlib

    from mysql_es_spark.operators.sampling import (
        duckdb_stratified_predicate,
        stratified_sample,
    )
    from mysql_es_spark.sources.tables import local_rows_df

    rows = [(i, ["en", "es", "fr", "de"][i % 4]) for i in range(2000)]
    df = local_rows_df(spark, rows, "doc_id long, lang string")
    fr = {"en": 0.5, "es": 0.25, "fr": 0.1}
    got = {r.doc_id for r in stratified_sample(df, "lang", fr, default=0.02).collect()}

    def u(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    want = {
        i for i, lang in rows if u(i) < round(fr.get(lang, 0.02) * 2**32)
    }
    assert got == want
    # per-stratum rates in the right ballpark (hash uniformity sanity)
    n_en = sum(1 for i in got if i % 4 == 0)
    assert 0.35 < n_en / 500 < 0.65

    # DuckDB predicate selects the identical row set
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    pred = duckdb_stratified_predicate("lang", fr, default=0.02)
    dd = {r[0] for r in con.sql(f"SELECT doc_id FROM t WHERE {pred}").fetchall()}
    assert dd == want


def test_stratified_sample_invariant_under_repartition(spark):
    from mysql_es_spark.operators.sampling import stratified_sample
    from mysql_es_spark.sources.tables import local_rows_df

    rows = [(i, "en" if i % 2 else "es") for i in range(500)]
    df = local_rows_df(spark, rows, "doc_id long, lang string")
    a = {r.doc_id for r in stratified_sample(df, "lang", {"en": 0.3, "es": 0.6}).collect()}
    b = {
        r.doc_id
        for r in stratified_sample(
            df.repartition(13, "lang"), "lang", {"en": 0.3, "es": 0.6}
        ).collect()
    }
    assert a == b


def test_stratified_sample_validation(spark):
    import pytest as _pytest

    from mysql_es_spark.operators.sampling import stratified_sample
    from mysql_es_spark.sources.tables import local_rows_df

    df = local_rows_df(spark, [(1, "en")], "doc_id long, lang string")
    with _pytest.raises(ValueError):
        stratified_sample(df, "lang", {})
    with _pytest.raises(ValueError):
        stratified_sample(df, "lang", {"en": 1.5})
