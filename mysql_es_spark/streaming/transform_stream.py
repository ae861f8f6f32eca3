"""Continuous transforms — ES ``_transform`` in ``sync`` mode.

An ES continuous transform wakes on a schedule, checks the sync field
for new source data, and recomputes only the changed buckets. The batch
half (watermark, changed-key detection, bucket-limited rewrite) lives
in plans/transform.py; this module is the wake-up loop, Spark-first:
Structured Streaming tails the source directory and each micro-batch
triggers ONE :func:`tick_transform` against the full current source —
the stream is the change *signal*, the tick is the change *computation*,
exactly ES's checkpoint model (the destination row for a key always
reflects all source docs for that key, never a delta).

Why the tick re-reads the source instead of aggregating the batch:
ES transforms promise entity rows computed over the whole source — a
batch-only aggregate would double-count on replay and miss history for
keys that changed. The tick's own watermark makes it idempotent, so
foreachBatch's at-least-once is safe; a crash between the data write
and the checkpoint replays the same bucket rewrites.

Scale: per wake-up, work ∝ changed keys' buckets (plans/transform.py's
contract); the streaming layer adds only file-listing of the tailed
directory.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..plans.transform import TransformConfig, tick_transform


def start_transform_stream(
    spark: SparkSession,
    source_dir: str,
    dest: str,
    cfg: TransformConfig,
    checkpoint_dir: str,
    schema=None,
):
    """Tail ``source_dir`` (parquet) and tick the transform once per
    micro-batch of newly-arrived files. ``schema`` defaults to the
    current source's own schema. Returns the StreamingQuery
    (availableNow — drain pending files, tick, stop; rerun on a cron the
    way ES's ``frequency`` does)."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def handle(batch_df, epoch_id: int) -> None:
        # the batch content only signals arrival; semantics require the
        # full source (see module docstring)
        tick_transform(spark, spark.read.parquet(source_dir), dest, cfg)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
