"""Incremental re-index — the reference's binlog/CDC phase, Spark-first.

mysql-es tails the MySQL binlog via embedded canal, applies row events in
order, re-joins affected relations, and upserts ES docs by _id, saving the
binlog position after each write (SURVEY.md §3.2, canal/Canal.java:139-230,
Consumer.java:87-109). Our equivalent, built on the static per-bucket docid
ranges (operators/docids.py):

- a change set (any mix of insert/update/delete of turns) is reduced to
  the set of *affected conv_ids* → affected *buckets* (deterministic hash);
- each affected bucket's wave is rebuilt from the current snapshot —
  conversation-level rebuild mirrors how a parent change re-syncs every
  embedded child doc (Associate reverse propagation, River.java:539-600) —
  and committed to lineage (a fresh 'complete' row per rebuild — the
  lineage table is an append-only audit log, latest row wins);
- term_dict / corpus_stats are re-finalized (cheap merges of per-wave
  partials).

Idempotent and at-least-once: replaying a batch rebuilds the same bytes
(the ST2 contract). The Structured Streaming wrapper consumes a directory
of transcript-delta parquet files with ``foreachBatch`` + availableNow,
exactly the reference's dump→tail handover (ST1): batch build from
snapshot S, then incremental from S.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..corpus import TRANSCRIPT_SCHEMA
from ..operators.docids import with_bucket
from ..plans.build import build_wave, commit_lineage, finalize, waves_of


def affected_buckets(changed_conv_ids: DataFrame, cfg: IndexConfig) -> list[int]:
    """Distinct buckets touched by a change set (tiny collect: ≤ n_buckets)."""
    rows = (
        with_bucket(changed_conv_ids.select("conv_id").distinct(), cfg)
        .select("bucket")
        .distinct()
        .collect()
    )
    return sorted(int(r["bucket"]) for r in rows)


def incremental_update(
    spark: SparkSession,
    transcripts_now: DataFrame,
    changed_conv_ids: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    batch_id: int = -1,
    merge: str = "auto",
    merge_max_docs: int = 20_000,
) -> dict:
    """Rebuild only the waves whose buckets contain changed conversations.
    Each rebuilt wave appends its counters to the durable metrics table
    under source='incremental' with this ``batch_id`` (the CDC stream
    passes its epoch), so per-batch ingest volume is queryable after the
    fact — the reference's Statistic counters, persisted.

    ``merge="auto"`` (default) first attempts the posting-level merge
    fast path (streaming/posting_merge.py) when the batch is update-only
    and small (≤ ``merge_max_docs`` docs) — it splices the delta into
    existing posting blocks instead of rebuilding whole waves, with
    bit-exact stats (rank identity vs a full rebuild). Batches that
    insert/delete doc rows, oversized batches, or replays after an
    interrupted merge fall through to the wave rebuild below, which is
    fully idempotent and overwrites everything a partial merge touched.
    ``merge="never"`` forces the rebuild path."""
    from ..operators.query import effective_config
    from .posting_merge import clear_marker, marker_buckets, try_posting_merge

    # the index already exists: its persisted layout is the ground truth a
    # rebuild wave must match (bucket hash, salts, positions, ...)
    cfg = effective_config(spark, index_dir, cfg)
    buckets = affected_buckets(changed_conv_ids, cfg)
    stale = marker_buckets(index_dir)  # interrupted merge → heal via rebuild
    if stale:
        buckets = sorted(set(buckets) | set(stale))
        merge = "never"
    if not buckets:
        return {"waves_rebuilt": [], "buckets": []}
    if merge != "never":
        res = try_posting_merge(
            spark, transcripts_now, changed_conv_ids, index_dir, cfg,
            batch_id=batch_id, max_changed_docs=merge_max_docs,
        )
        if res is not None:
            return res
    bucket_set = set(buckets)
    df = with_bucket(transcripts_now, cfg)
    rebuilt = []
    for wave_id, wave_buckets in enumerate(waves_of(cfg)):
        if not bucket_set.intersection(wave_buckets):
            continue
        row = build_wave(
            spark, df, index_dir, wave_id, wave_buckets, cfg,
            source="incremental", batch_id=batch_id,
        )
        commit_lineage(spark, index_dir, row)
        rebuilt.append(wave_id)
    finalize(spark, index_dir, cfg)
    _clear_deletes_for_buckets(spark, index_dir, buckets, cfg)
    clear_marker(index_dir)
    return {"waves_rebuilt": rebuilt, "buckets": buckets}


def _clear_deletes_for_buckets(
    spark: SparkSession, index_dir: str, buckets: list[int], cfg: IndexConfig
) -> None:
    """Snapshot truth wins: a rebuilt bucket was re-indexed from the
    current snapshot, so soft-delete marks inside it are stale — in ES,
    indexing an ``_id`` after a delete makes the doc live again. Docid →
    bucket is pure math (static ranges, operators/docids.py), so this is
    a filter of the tiny deletes table, rewritten via a temp dir (an
    Iceberg deployment would make this a transactional REPLACE)."""
    import shutil

    from ..operators.docids import bucket_capacity
    from ..sources import tables as tbl

    if not buckets or not tbl.exists(index_dir, "deletes"):
        return
    cap = bucket_capacity(cfg.n_buckets)
    path = tbl.p(index_dir, "deletes")
    kept = tbl.read(spark, index_dir, "deletes").filter(
        ~F.floor(F.col("docid") / F.lit(cap)).cast("int").isin([int(b) for b in buckets])
    )
    tmp = path + "._rewrite"
    kept.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)


def start_cdc_stream(
    spark: SparkSession,
    delta_dir: str,
    snapshot: Callable[[], DataFrame],
    index_dir: str,
    checkpoint_dir: str,
    cfg: IndexConfig | None = None,
    processing_time: str | None = None,
    merge: str = "auto",
):
    """Tail a directory of transcript-delta parquet files and fold each
    micro-batch into the index. ``snapshot()`` returns the current full
    transcripts table (on a cluster: the Iceberg table, whose snapshot id
    would be recorded in lineage). Returns the StreamingQuery; callers use
    ``q.processAllAvailable()`` / ``awaitTermination``.

    Two trigger modes (round 4, VERDICT r3 item 6):

    - default ``availableNow``: drain what exists, then stop — the
      batch-shaped tick the tests and the backfill→tail handover use.
    - ``processing_time`` (e.g. ``"1s"``): a LONG-RUNNING stream firing
      every interval — the Spark shape of the reference's continuous
      200 ms canal flush loop (Emiter.java:109). Each micro-batch
      dispatches through the same ``incremental_update`` (posting-merge
      fast path for small update-only deltas, bucket rebuild otherwise),
      and the checkpoint + crash-marker machinery carries across a kill:
      a restart from the same checkpoint replays the unfinished batch,
      and a ``_MERGE_INFLIGHT`` marker left by a mid-merge crash forces
      the healing rebuild (ST2, at-least-once)."""
    cfg = cfg or IndexConfig()
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(delta_dir)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        changed = batch_df.select("conv_id").distinct()
        incremental_update(
            spark, snapshot(), changed, index_dir, cfg,
            batch_id=int(epoch_id), merge=merge,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
