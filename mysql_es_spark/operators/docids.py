"""Deterministic dense docid assignment.

The reference's document identity is the multi-column pk joined with ":"
(Record.getID, /root/reference/src/main/java/org/fly/sync/mysql/model/
Record.java:193-205) — ours is ``doc_key = concat_ws(':', conv_id,
turn_idx)`` plus an engine-internal dense int64 ``docid`` that posting
compression and block-max pruning need.

Scalable + deterministic scheme (no zipWithIndex nondeterminism, no global
single-partition window):

1. ``bucket = pmod(xxhash64(conv_id), n_buckets)`` — deterministic hash;
   a conversation's turns always land in one bucket (locality for the
   forward table) and buckets are the resume/lineage unit.
2. One cheap count-per-bucket job → cumulative offsets (n_buckets rows on
   the driver — fine at 4096 buckets / 10^12 turns).
3. Within each bucket: ``row_number() over (partition by bucket order by
   conv_id, turn_idx)`` — one shuffle partition per bucket, so choose
   n_buckets ≥ executors at scale.
4. ``docid = offset[bucket] + rn - 1``.

docids are therefore dense in [0, N), stable across runs, and sorted by
(bucket, conv_id, turn_idx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import IndexConfig


def with_bucket(df: DataFrame, cfg: IndexConfig) -> DataFrame:
    return df.withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.coalesce(F.col("conv_id"), F.lit(""))), F.lit(cfg.n_buckets)).cast(
            "int"
        ),
    )


def bucket_counts(df_with_bucket: DataFrame) -> dict[int, int]:
    rows = df_with_bucket.groupBy("bucket").count().collect()
    return {int(r["bucket"]): int(r["count"]) for r in rows}


def bucket_offsets(counts: dict[int, int], n_buckets: int) -> dict[int, int]:
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    return offsets


def assign_docids(
    df_with_bucket: DataFrame, offsets: dict[int, int], spark=None
) -> DataFrame:
    """Add dense int64 ``docid`` and string ``doc_key`` columns."""
    spark = spark or df_with_bucket.sparkSession
    off_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], schema="bucket int, _offset long"
    )
    w = Window.partitionBy("bucket").orderBy("conv_id", "turn_idx")
    return (
        df_with_bucket.join(F.broadcast(off_df), "bucket")
        .withColumn("docid", F.col("_offset") + F.row_number().over(w) - F.lit(1))
        .drop("_offset")
        .withColumn("doc_key", F.concat_ws(":", F.col("conv_id"), F.col("turn_idx")))
    )
