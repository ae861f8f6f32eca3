"""Durable build/ingest metrics — the reference's Statistic counters made
queryable (ReportAction.java:14-41 logs record/insert/update/delete/relate
counts every 15 s and then they're gone; here every wave build and every
incremental batch appends its counters to a ``metrics`` parquet next to
lineage, so operational questions — how many docs did batch 17 index, how
many empty-text rows arrived last night — are one SQL query later).

Rows are narrow (source, batch_id, wave, metric, value, recorded_at):
new counters never need a schema migration, and per-partition error
counts (ST8) fit the same shape. Writes are tiny driver-side appends —
one LocalRelation per wave, never a shuffle."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables as tbl


def append_metrics(
    spark: SparkSession,
    index_dir: str,
    source: str,
    counters: dict[str, int],
    wave: int = -1,
    batch_id: int = -1,
) -> None:
    now = datetime.now(timezone.utc)
    rows = [
        (source, int(batch_id), int(wave), k, int(v), now)
        for k, v in sorted(counters.items())
    ]
    tbl.local_rows_df(spark, rows, tbl.METRICS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(tbl.p(index_dir, "metrics"))


def read_metrics(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.schema(tbl.METRICS_SCHEMA).parquet(tbl.p(index_dir, "metrics"))


def metrics_summary(spark: SparkSession, index_dir: str) -> DataFrame:
    """Cumulative totals by (source, metric) — the ReportAction report
    shape, derived instead of accumulated (replay-safe)."""
    return (
        read_metrics(spark, index_dir)
        .groupBy("source", "metric")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy("source", "metric")
    )
