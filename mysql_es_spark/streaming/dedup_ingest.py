"""Streaming dedup-on-ingest — drop already-seen documents as they arrive.

The LLM-pipeline counterpart of the reference's idempotent upsert-by-_id
(Consumer.java applies binlog rows by primary key, so re-delivered rows
can't duplicate docs): here identity is CONTENT, not key — a turn whose
analyzer-normalized text (operators/textstats.fingerprint: md5 over the
token stream, robust to case/accents/punctuation) was already accepted in
any earlier batch is dropped, so the accepted stream is exact-dedup clean
without ever re-scanning history.

Layout under ``out_dir``::

    accepted/batch=<epoch>/   the surviving rows of each micro-batch
    seen_fps/batch=<epoch>/   their fingerprints (the dedup state)

Scale shape: per batch, one Arrow tokenize pass over the BATCH (never
history), one hash-partitioned window for the in-batch first-wins, and one
anti-join against the seen-fps table — a narrow (fp) column scan that
Catalyst broadcasts while small and shuffles when it isn't. State grows
one short row per accepted doc, not per ingested doc.

At-least-once correctness: both tables are written as per-epoch partition
dirs in overwrite mode and the anti-join reads strictly EARLIER epochs, so
replaying a crashed epoch rewrites byte-identical output instead of
double-accepting (same commit discipline as plans/build.py lineage).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..corpus import TRANSCRIPT_SCHEMA
from ..operators.textstats import fingerprint


def _seen_before(spark: SparkSession, seen_dir: str, epoch_id: int) -> DataFrame | None:
    """Fingerprints accepted in epochs strictly before ``epoch_id``, or
    None when no prior state exists."""
    if not os.path.isdir(seen_dir) or not any(
        e.startswith("batch=") for e in os.listdir(seen_dir)
    ):
        return None
    seen = spark.read.parquet(seen_dir)
    return seen.filter(F.col("batch") < int(epoch_id)).select("fp")


def dedup_batch(
    spark: SparkSession, batch_df: DataFrame, epoch_id: int, out_dir: str
) -> dict:
    """Fold one micro-batch: accept first-seen-content rows, persist their
    fingerprints. Exposed for direct driving (tests, backfills); the
    stream wrapper calls exactly this. Idempotent per epoch."""
    accepted_dir = os.path.join(out_dir, "accepted", f"batch={int(epoch_id)}")
    seen_dir = os.path.join(out_dir, "seen_fps")

    keyed = batch_df.withColumn(
        "doc_key", F.concat_ws(":", F.col("conv_id"), F.col("turn_idx"))
    )
    fps = fingerprint(keyed, "doc_key", "text")
    # in-batch first-wins: deterministic by doc_key so replay is stable
    w = Window.partitionBy("fp").orderBy(F.col("doc_key").asc())
    firsts = (
        fps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_key", "fp")
    )
    prior = _seen_before(spark, seen_dir, epoch_id)
    if prior is not None:
        firsts = firsts.join(prior, "fp", "left_anti")
    accepted = keyed.join(firsts.select("doc_key"), "doc_key", "inner").drop("doc_key")
    accepted.write.mode("overwrite").parquet(accepted_dir)
    firsts.select("fp").write.mode("overwrite").parquet(
        os.path.join(seen_dir, f"batch={int(epoch_id)}")
    )
    n_in = batch_df.count()
    n_ok = spark.read.parquet(accepted_dir).count()
    return {"batch": int(epoch_id), "n_in": int(n_in), "n_accepted": int(n_ok)}


def start_dedup_ingest(
    spark: SparkSession,
    delta_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Tail a directory of transcript parquet files and write the
    content-deduplicated accepted stream. Returns the StreamingQuery
    (availableNow trigger; callers ``awaitTermination``)."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(delta_dir)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        dedup_batch(spark, batch_df, int(epoch_id), out_dir)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
