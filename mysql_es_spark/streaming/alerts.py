"""Continuous percolation — ES Watcher / percolate-on-ingest.

The reference's deployments pair the MySQL→ES sync with watch queries
that fire as rows arrive (ES alerting percolates each indexed doc
against stored queries). Spark-first: the same transcript-delta stream
the CDC indexer tails (streaming/incremental.py) also flows through
:func:`operators.percolate.percolate` per micro-batch, and every
(doc, stored query) hit is appended to a durable ``alerts`` parquet
table keyed by the batch epoch.

Scale shape: per batch, one Arrow tokenize pass over the delta (NOT the
corpus) joined against the broadcast stored-query term table — cost is
O(batch), independent of index size. Delivery is Structured Streaming's
at-least-once for foreachBatch side effects; alerts carry
(doc_key, query_id, batch_id) so downstream consumers dedup on the
natural key, the same contract as the reference's idempotent-by-_id
writes (SURVEY.md §2.10 ST2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import TRANSCRIPT_SCHEMA
from ..operators.percolate import percolate


def percolate_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    queries: list[tuple[str, str, str]],
    batch_id: int = -1,
) -> DataFrame:
    """(conv_id, turn_idx, doc_key, query_id, batch_id) hits for one
    delta batch."""
    keyed = batch_df.withColumn(
        "doc_key", F.concat_ws(":", F.col("conv_id"), F.col("turn_idx"))
    )
    hits = percolate(spark, keyed, queries, id_col="doc_key", text_col="text")
    keys = keyed.select("doc_key", "conv_id", "turn_idx")
    return (
        hits.join(keys, "doc_key")
        .select(
            "conv_id", "turn_idx", "doc_key", "query_id",
            F.lit(int(batch_id)).alias("batch_id"),
        )
    )


def start_alert_stream(
    spark: SparkSession,
    delta_dir: str,
    queries: list[tuple[str, str, str]],
    alerts_dir: str,
    checkpoint_dir: str,
):
    """Tail the transcript-delta directory and append percolator hits to
    ``alerts_dir``. Returns the StreamingQuery (availableNow trigger —
    the same drain-then-stop contract as the CDC indexer)."""
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(delta_dir)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        percolate_batch(spark, batch_df, queries, batch_id=int(epoch_id)).write.mode(
            "append"
        ).parquet(alerts_dir)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
