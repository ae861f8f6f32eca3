"""_downsample: rollup correctness, closed re-bucket algebra, pruning."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.plans.downsample import (
    downsample,
    read_downsampled,
    rollup_downsampled,
)

T0 = datetime(2024, 3, 1)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        (i, T0 + timedelta(minutes=17 * i), ["a", "b"][i % 2], float(i % 13) + 0.5)
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp, host string, v double")


def test_downsample_matches_groupby(spark, series, tmp_path):
    dest = str(tmp_path / "ds")
    info = downsample(spark, series, dest, "6 hours", ["host"], ["v"])
    assert info["rows_in"] == 400 and info["rows_out"] < 400
    got = {
        (r.host, r.ts_bucket, r.v_min, r.v_max, round(r.v_sum, 6), r.v_value_count)
        for r in read_downsampled(spark, dest).collect()
    }
    want = {
        (r.host, r.b, r.mn, r.mx, round(r.s, 6), r.c)
        for r in series.groupBy(
            "host", F.window("ts", "6 hours")["start"].alias("b")
        )
        .agg(
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
        )
        .collect()
    }
    assert got == want


def test_rollup_is_exact_vs_raw(spark, series, tmp_path):
    dest = str(tmp_path / "ds2")
    downsample(spark, series, dest, "1 hour", ["host"], ["v"])
    coarser = rollup_downsampled(
        read_downsampled(spark, dest), "1 day", ["host"], ["v"]
    )
    got = {
        (r.host, r.ts_bucket, r.v_min, r.v_max, round(r.v_sum, 6), r.v_value_count)
        for r in coarser.collect()
    }
    want = {
        (r.host, r.b, r.mn, r.mx, round(r.s, 6), r.c)
        for r in series.groupBy("host", F.window("ts", "1 day")["start"].alias("b"))
        .agg(
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
        )
        .collect()
    }
    assert got == want  # min/max/sum/value_count: closed under re-bucketing


def test_partition_pruning_on_bucket_date(spark, series, tmp_path):
    from tests.test_plan_audits import plan_of

    dest = str(tmp_path / "ds3")
    downsample(spark, series, dest, "6 hours", ["host"], ["v"])
    df = spark.read.parquet(f"{dest}/table").filter(
        F.col("bucket_date") == "2024-03-02"
    )
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    assert "bucket_date" in plan.split("PartitionFilters")[1].splitlines()[0]


def test_missing_column_fails_loudly(spark, series, tmp_path):
    with pytest.raises(ValueError, match="nope"):
        downsample(spark, series, str(tmp_path / "x"), "1 hour", ["nope"], ["v"])
