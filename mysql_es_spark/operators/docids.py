"""Deterministic docid assignment.

The reference's document identity is the multi-column pk joined with ":"
(Record.getID, /root/reference/src/main/java/org/fly/sync/mysql/model/
Record.java:193-205) — ours is ``doc_key = concat_ws(':', conv_id,
turn_idx)`` plus an engine-internal int64 ``docid`` that posting
compression and block-max pruning need.

Scalable + deterministic scheme (no zipWithIndex nondeterminism, no global
single-partition window, no pre-count job):

1. ``bucket = pmod(xxhash64(conv_id), n_buckets)`` — deterministic hash;
   a conversation's turns always land in one bucket (locality for the
   forward table) and buckets are the resume/lineage/incremental unit.
2. Each bucket owns a *static* docid range ``[bucket·C, (bucket+1)·C)``
   with capacity ``C = 2^62 / n_buckets``.
3. Within each bucket: ``row_number() over (partition by bucket order by
   conv_id, turn_idx)`` — one shuffle partition per bucket, so choose
   n_buckets ≥ executor slots at scale (4096 at 10^12 turns ⇒ ~2.4·10^8
   docs/bucket, far under C).
4. ``docid = bucket·C + rn - 1``.

docids are therefore unique, stable across runs, dense *within* a bucket,
and sorted by (bucket, conv_id, turn_idx). Static offsets (vs cumulative
counts) mean a changed bucket can be re-assigned and re-indexed in
isolation — the incremental/CDC path (streaming/incremental.py) rebuilds
only affected buckets, exactly like the reference re-syncs only changed
rows from the binlog (SURVEY.md §3.2). Posting blocks never assume global
density, only ascending order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import IndexConfig


def bucket_capacity(n_buckets: int) -> int:
    return (1 << 62) // n_buckets


def with_bucket(df: DataFrame, cfg: IndexConfig) -> DataFrame:
    return df.withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.coalesce(F.col("conv_id"), F.lit(""))), F.lit(cfg.n_buckets)).cast(
            "int"
        ),
    )


def assign_docids(df_with_bucket: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Add int64 ``docid`` and string ``doc_key`` columns (see module doc)."""
    cap = bucket_capacity(cfg.n_buckets)
    w = Window.partitionBy("bucket").orderBy("conv_id", "turn_idx")
    return df_with_bucket.withColumn(
        "docid",
        F.col("bucket").cast("long") * F.lit(cap) + F.row_number().over(w) - F.lit(1),
    ).withColumn("doc_key", F.concat_ws(":", F.col("conv_id"), F.col("turn_idx")))
