"""Watermarked event-time windowed aggregation — the stock Structured
Streaming pattern for late data (tumbling/sliding windows + watermark).

The reference never needs event-time windows (the binlog is totally
ordered, SURVEY.md §2.10 ST6); a transcript/event analytics pipeline
does: per-window counts/sums that tolerate late arrivals up to the
watermark, then finalize. Everything here is stock
``withWatermark().groupBy(window(...))`` — state eviction, late-row
dropping, and incremental aggregation are Spark's; the module pins the
engine's conventions (append mode ⇒ only finalized windows are emitted,
deterministic output schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_COLS = ["window_start", "window_end", "event_type", "n", "total_value"]


def windowed_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    slide: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, event_type) counts and value sums with late-data
    tolerance of ``watermark``. Works on a stream (append mode emits each
    window once, when the watermark passes its end) and, identically, on
    a batch DataFrame (watermark is a no-op there) — the batch form is the
    backfill path, mirroring the build/tail handover contract (ST1)."""
    w = F.window(F.col(ts_col), window, slide or window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def start_windowed_stream(
    spark,
    source_dir: str,
    schema,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
):
    """File-source → windowed agg → parquet sink, availableNow trigger.
    Append output mode: a window row is written exactly once, after the
    watermark passes its end — late rows beyond the watermark are dropped
    by Spark's state eviction (the documented, bounded-state contract)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_counts(stream, window=window, watermark=watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
