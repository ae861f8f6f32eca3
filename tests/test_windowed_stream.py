"""Watermarked windowed aggregation: batch/stream parity and append-mode
finalization semantics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.streaming.windowed import start_windowed_stream, windowed_counts

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _rows():
    t = lambda m: datetime(2026, 1, 1, 10, m)
    return [
        (1, t(1), "click", 1.0),
        (2, t(4), "click", 2.0),
        (3, t(11), "view", 3.0),
        (4, t(12), "click", 4.0),
        (5, t(25), "view", 5.0),
        # late-but-within-watermark arrival for the first window
        (6, t(7), "click", 6.0),
        # a much later event pushes the watermark far past every window
        (7, datetime(2026, 1, 1, 12, 0), "view", 7.0),
    ]


def test_batch_windowed_counts(spark):
    df = spark.createDataFrame(_rows(), schema=SCHEMA)
    got = {
        (r.window_start.minute, r.event_type): (r.n, r.total_value)
        for r in windowed_counts(df).collect()
    }
    assert got[(0, "click")] == (3, 9.0)  # 10:00-10:10 clicks incl. late row
    assert got[(10, "view")] == (1, 3.0)
    assert got[(10, "click")] == (1, 4.0)
    assert got[(20, "view")] == (1, 5.0)


def test_stream_matches_batch_and_finalizes(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    spark.createDataFrame(_rows(), schema=SCHEMA).coalesce(1).write.parquet(src)
    q = start_windowed_stream(
        spark, src, SCHEMA, sink, ckpt, window="10 minutes", watermark="30 minutes"
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    batch = windowed_counts(spark.createDataFrame(_rows(), schema=SCHEMA))
    # append mode finalizes every window whose end < watermark (12:00-0:30
    # = 11:30): that is all four event windows; the 12:00 event's own
    # window is still open and correctly absent
    finalized = batch.filter(F.col("window_end") <= "2026-01-01 11:30:00")
    a = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in finalized.collect()}
    assert a == b and len(a) == 4
