"""ES ``_downsample``: fixed-interval rollup of a time-series table.

ES downsampling replaces raw TSDB documents with one document per
(dimensions, time bucket) storing, for every gauge metric, the
aggregates needed to answer any COARSER query later: min / max / sum /
value_count (docs.elastic.co downsampling; the reference's event-shaped
rows are exactly this workload once in ES). The raw index is then
deleted — storage drops by the bucket ratio while date_histogram-style
queries stay answerable.

Spark-first: the rollup is ONE partial+final hash aggregate (map-side
combine makes the shuffle carry pre-reduced buckets, so at 10^12 rows
the shuffle is bucket-, not row-, sized); the destination is written
partitioned by bucket date, so time-bounded queries prune whole
partitions off the directory listing.

The algebra is closed under re-bucketing: min of mins, max of maxes,
sum of sums, sum of value_counts — ``rollup_downsampled`` re-aggregates
a downsampled table to any coarser interval and is exactly what ES does
when a query's calendar_interval is wider than the stored one.
Averages come out as sum/value_count, never stored (ES stores the same
decomposition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables as tbl

_SUFFIXES = ("min", "max", "sum", "value_count")


def _bucket(ts_col: str, interval: str) -> F.Column:
    # F.window aligns to the epoch for fixed intervals — the ES
    # fixed_interval contract (not calendar-aware; use e.g. "1 day",
    # "6 hours", "15 minutes")
    return F.window(F.col(ts_col), interval)["start"]


def _metric_aggs(metrics: list[str]) -> list[F.Column]:
    out = []
    for m in metrics:
        out.extend(
            [
                F.min(m).alias(f"{m}_min"),
                F.max(m).alias(f"{m}_max"),
                F.sum(m).alias(f"{m}_sum"),
                F.count(m).alias(f"{m}_value_count"),
            ]
        )
    return out


def downsample(
    spark: SparkSession,
    src: DataFrame,
    dest: str,
    interval: str,
    dims: list[str],
    metrics: list[str],
    ts_col: str = "ts",
) -> dict:
    """Roll ``src`` into one row per (dims, fixed-interval bucket) with
    min/max/sum/value_count per metric; write partitioned by bucket
    date. Returns {rows_in, rows_out, interval}."""
    missing = [c for c in [*dims, *metrics, ts_col] if c not in src.columns]
    if missing:
        raise ValueError(f"downsample: source has no column(s) {missing}")
    rows_in = src.count()
    out = (
        src.withColumn("ts_bucket", _bucket(ts_col, interval))
        .groupBy(*dims, "ts_bucket")
        .agg(*_metric_aggs(metrics))
        .withColumn("bucket_date", F.to_date("ts_bucket"))
    )
    out.write.mode("overwrite").partitionBy("bucket_date").parquet(tbl.p(dest, "table"))
    meta = [(interval, ",".join(dims), ",".join(metrics), ts_col)]
    tbl.local_rows_df(
        spark, meta, "interval string, dims string, metrics string, ts_col string"
    ).coalesce(1).write.mode("overwrite").parquet(tbl.p(dest, "_downsample_meta"))
    rows_out = spark.read.parquet(tbl.p(dest, "table")).count()
    return {"rows_in": rows_in, "rows_out": rows_out, "interval": interval}


def read_downsampled(spark: SparkSession, dest: str) -> DataFrame:
    return spark.read.parquet(tbl.p(dest, "table")).drop("bucket_date")


def rollup_downsampled(
    df: DataFrame, interval: str, dims: list[str], metrics: list[str]
) -> DataFrame:
    """Re-bucket an already-downsampled table to a COARSER fixed
    interval — the closed-algebra merge ES applies when a query is wider
    than the stored bucket. Exact for min/max/sum/value_count (and hence
    for any avg derived as sum/value_count)."""
    aggs = []
    for m in metrics:
        aggs.extend(
            [
                F.min(f"{m}_min").alias(f"{m}_min"),
                F.max(f"{m}_max").alias(f"{m}_max"),
                F.sum(f"{m}_sum").alias(f"{m}_sum"),
                F.sum(f"{m}_value_count").alias(f"{m}_value_count"),
            ]
        )
    return (
        df.withColumn("ts_bucket", _bucket("ts_bucket", interval))
        .groupBy(*dims, "ts_bucket")
        .agg(*aggs)
    )
