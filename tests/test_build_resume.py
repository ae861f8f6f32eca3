"""Resumability: kill the build mid-way, resume, get identical tables and
skip the completed waves (SURVEY.md §5 item 5; reference analog: binlog
position checkpoint, setting/Setting.java:179-210)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.plans.build import InjectedFailure, build_index, completed_waves
from tests.conftest import TEST_CFG


def _table_fingerprint(spark, d: str, table: str, cols: list[str]):
    df = spark.read.parquet(f"{d}/{table}").select(*cols)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*cols), F.lit(2**31))).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def test_kill_resume_identical(spark, tiny_transcripts, built_index, tmp_path):
    d = str(tmp_path / "ix_resume")
    with pytest.raises(InjectedFailure):
        build_index(spark, tiny_transcripts, d, TEST_CFG, fail_after_waves=1)
    assert completed_waves(spark, d) == {0}

    m = build_index(spark, tiny_transcripts, d, TEST_CFG, resume=True)
    assert m["waves_skipped"] == [0]
    assert m["waves_run"] == [1]

    # resumed build == uninterrupted build, table by table
    for table, cols in [
        ("forward", ["docid", "doc_key", "text"]),
        ("doc_lens", ["docid", "dl"]),
        ("term_dict", ["term", "df", "ttf"]),
        ("postings", ["term", "start_docid", "n", "max_tf", "min_dl"]),
    ]:
        assert _table_fingerprint(spark, d, table, cols) == _table_fingerprint(
            spark, built_index, table, cols
        ), table


def test_lineage_metrics(spark, built_index):
    lin = spark.read.parquet(f"{built_index}/lineage")
    rows = lin.orderBy("wave").collect()
    assert [r["wave"] for r in rows] == [0, 1]
    assert all(r["status"] == "complete" for r in rows)
    assert all(r["wall_sec"] > 0 for r in rows)
    total_docs = sum(r["n_docs"] for r in rows)
    n_fwd = spark.read.parquet(f"{built_index}/forward").count()
    assert total_docs == n_fwd
    assert all(r["n_blocks"] > 0 and r["n_postings"] > 0 for r in rows)


def test_empty_corpus_builds_valid_index(spark, tmp_path):
    """Zero-row input must yield a valid, queryable (empty) index — the
    explicit-schema wave read-backs cover fully empty buckets too."""
    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.corpus import TRANSCRIPT_SCHEMA
    from mysql_es_spark.operators.query import bm25_topk
    from mysql_es_spark.plans.build import build_index

    cfg = IndexConfig(n_buckets=2, wave_size=2, salt_docs=64, term_buckets=2)
    df = spark.createDataFrame([], schema=TRANSCRIPT_SCHEMA)
    ix = str(tmp_path / "empty_ix")
    m = build_index(spark, df, ix, cfg)
    assert m["n_docs_built"] == 0
    assert bm25_topk(spark, ix, "w0", k=5, cfg=cfg).count() == 0
