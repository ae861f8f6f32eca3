"""Incremental re-index (CDC analog): per-bucket rebuild equals a full
rebuild of the new snapshot; the streaming wrapper folds delta files in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_es_spark import corpus
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.streaming.incremental import incremental_update, start_cdc_stream
from tests.conftest import TEST_CFG


def _fingerprints(spark, d):
    out = {}
    for table, cols in [
        ("forward", ["docid", "doc_key", "text"]),
        ("doc_lens", ["docid", "dl"]),
        ("term_dict", ["term", "df", "ttf"]),
    ]:
        df = spark.read.parquet(f"{d}/{table}").select(*cols)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64(*cols), F.lit(2**31))).alias("h"),
        ).collect()[0]
        out[table] = (row["n"], row["h"])
    return out


@pytest.fixture(scope="module")
def snapshots(spark):
    v1 = corpus.transcripts_df(spark, 600, seed=11).cache()
    # v2: update one conv's text, insert a new turn in another, delete a third
    upd = v1.filter(F.col("conv_id") == "c00000003").withColumn(
        "text", F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(" updatedmarker"))
    )
    from datetime import datetime

    ins = spark.createDataFrame(
        [("c00000005", 99, "user", "brand new inserted turn", None, datetime(2026, 2, 1))],
        schema=corpus.TRANSCRIPT_SCHEMA,
    )
    v2 = (
        v1.filter(~F.col("conv_id").isin("c00000003", "c00000007"))
        .unionByName(upd)
        .unionByName(ins)
        .cache()
    )
    changed = spark.createDataFrame(
        [("c00000003",), ("c00000005",), ("c00000007",)], schema="conv_id string"
    )
    return v1, v2, changed


def test_incremental_equals_full_rebuild(spark, snapshots, tmp_path):
    v1, v2, changed = snapshots
    inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")
    build_index(spark, v1, inc_dir, TEST_CFG)
    res = incremental_update(spark, v2, changed, inc_dir, TEST_CFG)
    assert res["buckets"]  # something was touched
    build_index(spark, v2, full_dir, TEST_CFG)
    assert _fingerprints(spark, inc_dir) == _fingerprints(spark, full_dir)


def test_streaming_cdc_wrapper(spark, snapshots, tmp_path):
    v1, v2, changed = snapshots
    ix = str(tmp_path / "ix")
    delta_dir = str(tmp_path / "deltas")
    ckpt = str(tmp_path / "ckpt")
    build_index(spark, v1, ix, TEST_CFG)
    # delta file = the changed conv rows in the new snapshot
    v2.join(changed, "conv_id", "left_semi").write.mode("overwrite").parquet(delta_dir)
    q = start_cdc_stream(spark, delta_dir, lambda: v2, ix, ckpt, TEST_CFG)
    q.awaitTermination()
    full_dir = str(tmp_path / "full2")
    build_index(spark, v2, full_dir, TEST_CFG)
    assert _fingerprints(spark, ix) == _fingerprints(spark, full_dir)
