"""Posting-level incremental merge — the small-CDC-batch fast path.

The general incremental path (streaming/incremental.py) rebuilds every
wave containing a changed conversation — correct and ES-like (a whole
Lucene-segment rewrite), but at a ~1% change rate most of the rebuilt
postings are identical to what was already on disk. This module splices
the delta directly into the existing posting blocks when the batch is
UPDATE-ONLY: every changed conv_id already exists in the forward table
with the exact same set of (conv_id, turn_idx) doc_keys — the MySQL
UPDATE CDC event (text changed; rows neither inserted nor deleted),
which is the dominant case the reference tails from the binlog
(SURVEY.md §3.2; canal row events with type UPDATE). Only then are
docids stable: operators/docids.py assigns rank-based ids, so inserts/
deletes shift later docids in the bucket, which only a rebuild can
express — those batches fall back automatically.

Plan shape (all distributed, delta-proportional):

1. tokenize ONLY the changed docs — old text (read back from the
   forward table) and new text (two small Arrow passes). This yields
   the affected (wave, term, salt) pair set and exact per-wave
   term-stats deltas (−old +new), so finalize() reproduces term_dict /
   corpus_stats EXACTLY as a full rebuild would (rank identity is a
   test, not a hope).
2. postings: read ONLY the affected wave/term_bucket partition dirs
   (directory pruning via literal predicates), broadcast-mark affected
   (term, salt) groups, re-encode those groups with changed docids
   masked out and new postings spliced in (applyInPandas; the group
   count is delta-proportional), pass every other row of the touched
   partitions through untouched, write to a temp dir, swap the touched
   term_bucket dirs.
3. forward / doc_lens: per affected wave, anti-join changed docids +
   union the new rows → temp → swap (scan+write, no shuffle — the
   expensive parts of a rebuild, the docid window and the full
   tokenize + posting shuffle/encode, never run).
4. finalize() re-merges term_dict / corpus_stats; delete marks for the
   re-indexed docids are cleared (ES: indexing an _id after a delete
   revives the doc), all other marks stay.

Crash safety: all temp dirs are fully written before the first swap; a
``_MERGE_INFLIGHT`` marker (JSON: batch_id + affected buckets)
brackets the swap sequence. If a crash lands inside that window, the
next incremental_update sees the marker and routes the marker's
buckets through the idempotent wave rebuild, which overwrites every
table the merge touches. A replay AFTER success is a natural no-op:
old text == new text ⇒ empty delta ⇒ identical bytes (the ST2
at-least-once contract).

Reference parity: ES/Lucene handle an update as delete+reindex into a
new segment and merge later; mysql-es relies on that via bulk update
actions (Writer.java:106-144). Here the "segment" granularity is a
(term, salt) block run, so the merge is surgical instead of deferred.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..config import IndexConfig
from ..functions.codecs import decode_block, decode_positions, encode_block, encode_positions
from ..operators.docids import bucket_capacity, with_bucket
from ..operators.postings import BLOCK_POS_SCHEMA, BLOCK_SCHEMA, tokenized
from ..sources import fsio
from ..sources import tables as tbl

MARKER = "_MERGE_INFLIGHT"


def marker_buckets(index_dir: str) -> list[int]:
    """Buckets recorded by an interrupted merge (empty when none)."""
    f = fsio.join(tbl.resolve(index_dir), MARKER)
    if not fsio.isfile(f):
        return []
    return [int(b) for b in json.loads(fsio.read_text(f)).get("buckets", [])]


def _write_marker(index_dir: str, batch_id: int, buckets: list[int]) -> None:
    f = fsio.join(tbl.resolve(index_dir), MARKER)
    fsio.write_text(
        f, json.dumps({"batch_id": int(batch_id), "buckets": [int(b) for b in buckets]})
    )


def clear_marker(index_dir: str) -> None:
    f = fsio.join(tbl.resolve(index_dir), MARKER)
    if fsio.isfile(f):
        fsio.remove(f)


def _swap(tmp: str, real: str) -> None:
    fsio.rmtree(real)
    if fsio.isdir(tmp):
        fsio.rename(tmp, real)


def _wave_expr(cap: int, wave_size: int):
    """wave id from docid — pure math (static bucket ranges)."""
    return (F.expr(f"docid DIV {cap}") / F.lit(wave_size)).cast("int")


def try_posting_merge(
    spark: SparkSession,
    transcripts_now: DataFrame,
    changed_conv_ids: DataFrame,
    index_dir: str,
    cfg: IndexConfig,
    batch_id: int = -1,
    max_changed_docs: int = 20_000,
) -> dict | None:
    """Attempt the update-only posting merge; return None to signal the
    caller (incremental_update) to fall back to the wave rebuild.

    Bails out — with zero side effects — when the batch inserts or
    deletes doc rows (doc_key sets differ), touches more than
    ``max_changed_docs`` docs, or the index has no forward table yet.
    """
    t0 = time.monotonic()
    if not tbl.exists(index_dir, "forward"):
        return None
    cap = bucket_capacity(cfg.n_buckets)
    with_pos = bool(cfg.with_positions)

    chg = F.broadcast(changed_conv_ids.select("conv_id").distinct())
    old = (
        tbl.read(spark, index_dir, "forward")
        .join(chg, "conv_id")
        .select(
            F.col("doc_key").alias("o_key"),
            "docid",
            F.col("text").alias("old_text"),
        )
    )
    new = (
        with_bucket(transcripts_now, cfg)
        .join(chg, "conv_id")
        .select(
            F.concat_ws(":", "conv_id", "turn_idx").alias("n_key"),
            "conv_id", "turn_idx", "role",
            F.col("text").alias("new_text"),
            "tool", "ts", "bucket",
        )
    )
    m = (
        old.join(new, old["o_key"] == new["n_key"], "full_outer")
        .withColumn("wave", _wave_expr(cap, cfg.wave_size))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        gate = m.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("o_key").isNull() | F.col("n_key").isNull(), 1).otherwise(0)
            ).alias("bad"),
        ).collect()[0]
        n_changed = int(gate["n"])
        if n_changed == 0 or int(gate["bad"] or 0) > 0 or n_changed > max_changed_docs:
            return None
        return _run_merge(spark, m, index_dir, cfg, batch_id, n_changed, t0)
    finally:
        m.unpersist()


def _run_merge(
    spark: SparkSession,
    m: DataFrame,
    index_dir: str,
    cfg: IndexConfig,
    batch_id: int,
    n_changed: int,
    t0: float,
) -> dict:
    from ..plans.build import FORWARD_COLS, commit_lineage, finalize
    from ..plans.metrics import append_metrics

    cap = bucket_capacity(cfg.n_buckets)
    with_pos = bool(cfg.with_positions)
    salt_docs = int(cfg.salt_docs)
    block_size = int(cfg.block_size)

    # --- delta tokenization: old and new text of ONLY the changed docs ---
    old_tok = tokenized(
        m.select("docid", F.col("old_text").alias("text")), cfg
    ).persist(StorageLevel.MEMORY_AND_DISK)
    new_tok = tokenized(
        m.select("docid", F.col("new_text").alias("text")), cfg
    ).persist(StorageLevel.MEMORY_AND_DISK)

    try:
        def _stats(tok: DataFrame) -> DataFrame:
            return (
                tok.filter(F.col("term").isNotNull())
                .withColumn("wave", _wave_expr(cap, cfg.wave_size))
                .groupBy("wave", "term")
                .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf"))
            )

        delta = (
            _stats(old_tok).select("wave", "term", F.col("df").alias("o_df"), F.col("ttf").alias("o_ttf"))
            .join(
                _stats(new_tok).select("wave", "term", F.col("df").alias("n_df"), F.col("ttf").alias("n_ttf")),
                ["wave", "term"],
                "full_outer",
            )
            .select(
                "wave", "term",
                (F.coalesce("n_df", F.lit(0)) - F.coalesce("o_df", F.lit(0))).alias("d_df"),
                (F.coalesce("n_ttf", F.lit(0)) - F.coalesce("o_ttf", F.lit(0))).alias("d_ttf"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

        # affected (wave, term, salt) groups = every group that holds a
        # changed docid today (old terms) or must hold one after (new terms)
        def _pairs(tok: DataFrame) -> DataFrame:
            return (
                tok.filter(F.col("term").isNotNull())
                .select(
                    _wave_expr(cap, cfg.wave_size).alias("wave"),
                    "term",
                    F.expr(f"docid DIV {salt_docs}").alias("salt"),
                )
            )

        pairs = (
            _pairs(old_tok)
            .unionByName(_pairs(new_tok))
            .distinct()
            .withColumn(
                "term_bucket",
                F.pmod(F.xxhash64("term"), F.lit(cfg.term_buckets)).cast("int"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

        # tiny collects: affected waves/buckets, wave → touched term_buckets
        wave_rows = m.select("wave", F.expr(f"docid DIV {cap}").alias("bucket")).distinct().collect()
        waves = sorted({int(r["wave"]) for r in wave_rows})
        buckets = sorted({int(r["bucket"]) for r in wave_rows})
        tb_rows = pairs.select("wave", "term_bucket").distinct().collect()
        wave_tbs: dict[int, list[int]] = {}
        for r in tb_rows:
            wave_tbs.setdefault(int(r["wave"]), []).append(int(r["term_bucket"]))

        # changed docids: bounded by max_changed_docs — broadcast as a
        # sorted array for vectorized membership tests in the merge UDF
        chg_ids = np.array(
            sorted(int(r["docid"]) for r in m.select("docid").collect()), dtype=np.int64
        )
        b_ids = spark.sparkContext.broadcast(chg_ids)
        chg_ids_df = tbl.local_rows_df(spark, [(int(i),) for i in chg_ids], "docid long")

        # --- postings: rewrite only the touched wave/term_bucket dirs ---
        prune = None
        for w, tbs in wave_tbs.items():
            c = (F.col("wave") == w) & F.col("term_bucket").isin(tbs)
            prune = c if prune is None else (prune | c)
        blk_names = [
            f.strip().split(" ")[0]
            for f in (BLOCK_POS_SCHEMA if with_pos else BLOCK_SCHEMA).split(",")
        ]

        # every temp lives under one underscore-prefixed root OUTSIDE the
        # table dirs: a crash before the swap window must never leave a
        # directory that partition discovery would pick up on the next
        # read (forward/wave=0._merge_tmp would parse as a wave value)
        tmp_root = fsio.join(tbl.resolve(index_dir), "_mergetmp")
        fsio.rmtree(tmp_root)
        post_root = tbl.p(index_dir, "postings")
        tmp_post = os.path.join(tmp_root, "postings")
        out_cols = ["wave"] + blk_names
        if prune is not None:
            blk = tbl.read(spark, index_dir, "postings").filter(prune)
            pr = F.broadcast(pairs.select("wave", "term", "salt").withColumn("_aff", F.lit(True)))
            marked = blk.join(pr, ["wave", "term", "salt"], "left")
            passthrough = marked.filter(F.col("_aff").isNull()).select(*out_cols)

            aff = marked.filter(F.col("_aff").isNotNull()).select(
                *out_cols,
                F.lit(0).alias("kind"),
                F.lit(None).cast("int").alias("tf"),
                F.lit(None).cast("int").alias("dl"),
                *([F.lit(None).cast("array<int>").alias("pos")] if with_pos else []),
            )
            newp = (
                new_tok.filter(F.col("term").isNotNull())
                .select(
                    _wave_expr(cap, cfg.wave_size).alias("wave"),
                    F.pmod(F.xxhash64("term"), F.lit(cfg.term_buckets)).cast("int").alias("term_bucket"),
                    "term",
                    F.expr(f"docid DIV {salt_docs}").alias("salt"),
                    F.col("docid").alias("start_docid"),
                    F.lit(1).alias("n"),
                    F.lit(None).cast("int").alias("max_tf"),
                    F.lit(None).cast("int").alias("min_dl"),
                    F.lit(None).cast("binary").alias("blob"),
                    *([F.lit(None).cast("binary").alias("pos_blob")] if with_pos else []),
                    F.lit(1).alias("kind"),
                    "tf", "dl",
                    *(["pos"] if with_pos else []),
                )
            )
            merged = (
                aff.unionByName(newp)
                .groupBy("wave", "term_bucket", "term", "salt")
                .applyInPandas(
                    _merge_group_fn(b_ids, block_size, with_pos),
                    schema="wave int, " + (BLOCK_POS_SCHEMA if with_pos else BLOCK_SCHEMA),
                )
            )
            (
                passthrough.unionByName(merged)
                .write.partitionBy("wave", "term_bucket")
                .mode("overwrite")
                .parquet(tmp_post)
            )

        # --- forward / doc_lens / term_stats temps, per affected wave ---
        new_dl = new_tok.filter(F.col("term").isNull()).select(
            "docid", "dl", _wave_expr(cap, cfg.wave_size).alias("wave")
        )
        swaps: list[tuple[str, str]] = []
        for w in waves:
            fdir = tbl.wave_dir(index_dir, "forward", w)
            kept = (
                spark.read.schema(tbl._EMPTY_FALLBACK["forward"]).parquet(fdir)
                .join(F.broadcast(chg_ids_df), "docid", "left_anti")
            )
            newfwd = m.filter(F.col("wave") == w).select(
                "docid",
                F.col("n_key").alias("doc_key"),
                "conv_id", "turn_idx", "role",
                F.col("new_text").alias("text"),
                "tool", "ts", "bucket",
            ).select(*FORWARD_COLS)
            ftmp = os.path.join(tmp_root, "forward", f"wave={w}")
            kept.select(*FORWARD_COLS).unionByName(newfwd).write.mode("overwrite").parquet(ftmp)
            swaps.append((ftmp, fdir))

            ddir = tbl.wave_dir(index_dir, "doc_lens", w)
            dkept = (
                spark.read.schema("docid long, dl int").parquet(ddir)
                .join(F.broadcast(chg_ids_df), "docid", "left_anti")
            )
            dtmp = os.path.join(tmp_root, "doc_lens", f"wave={w}")
            dkept.unionByName(
                new_dl.filter(F.col("wave") == w).select("docid", "dl")
            ).write.mode("overwrite").parquet(dtmp)
            swaps.append((dtmp, ddir))

            sdir = tbl.wave_dir(index_dir, "term_stats", w)
            cur = spark.read.schema("term string, df long, ttf long").parquet(sdir)
            adj = (
                cur.join(
                    F.broadcast(delta.filter(F.col("wave") == w).select("term", "d_df", "d_ttf")),
                    "term",
                    "full_outer",
                )
                .select(
                    "term",
                    (F.coalesce("df", F.lit(0)) + F.coalesce("d_df", F.lit(0))).alias("df"),
                    (F.coalesce("ttf", F.lit(0)) + F.coalesce("d_ttf", F.lit(0))).alias("ttf"),
                )
                .filter(F.col("df") > 0)
            )
            stmp = os.path.join(tmp_root, "term_stats", f"wave={w}")
            adj.write.mode("overwrite").parquet(stmp)
            swaps.append((stmp, sdir))

        # deletes: re-indexing an _id revives the doc (only the changed ids)
        del_tmp = None
        if tbl.exists(index_dir, "deletes"):
            dpath = tbl.p(index_dir, "deletes")
            dltmp = os.path.join(tmp_root, "deletes")
            (
                tbl.read(spark, index_dir, "deletes")
                .join(F.broadcast(chg_ids_df), "docid", "left_anti")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(dltmp)
            )
            del_tmp = (dltmp, dpath)

        # --- swap window: marker → swaps → finalize → clear ---
        _write_marker(index_dir, batch_id, buckets)
        for w, tbs in wave_tbs.items():
            for tb in tbs:
                _swap(
                    os.path.join(tmp_post, f"wave={w}", f"term_bucket={tb}"),
                    os.path.join(post_root, f"wave={w}", f"term_bucket={tb}"),
                )
        for tmp, real in swaps:
            _swap(tmp, real)
        if del_tmp:
            _swap(*del_tmp)
        fsio.rmtree(tmp_root)
        finalize(spark, index_dir, cfg)
        for w in waves:
            commit_lineage(
                spark,
                index_dir,
                (
                    int(w),
                    [b for b in buckets if b // cfg.wave_size == w],
                    int(n_changed),
                    -1,
                    -1,
                    time.monotonic() - t0,
                    "complete",
                    datetime.now(timezone.utc),
                ),
            )
        append_metrics(
            spark,
            index_dir,
            "merge",
            {
                "docs_updated": int(n_changed),
                "waves_touched": len(waves),
                "wall_ms": int((time.monotonic() - t0) * 1000),
            },
            wave=-1,
            batch_id=batch_id,
        )
        clear_marker(index_dir)
    finally:
        old_tok.unpersist()
        new_tok.unpersist()
        try:
            delta.unpersist()
            pairs.unpersist()
        except NameError:
            pass

    return {
        "mode": "posting_merge",
        "waves_rebuilt": [],
        "waves_merged": waves,
        "buckets": buckets,
        "docs_updated": int(n_changed),
    }


def _merge_group_fn(b_ids, block_size: int, with_pos: bool):
    """applyInPandas body: one (wave, term_bucket, term, salt) group →
    decode its blocks, mask out changed docids, splice new postings,
    re-encode. All numpy; groups are delta-proportional in count."""

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        wave, tb, term, salt = key
        changed = b_ids.value
        ids_parts, tf_parts, dl_parts, pos_parts = [], [], [], []
        blocks = pdf[pdf["kind"] == 0].sort_values("start_docid")
        for _, row in blocks.iterrows():
            d, t, l = decode_block(row["blob"], int(row["n"]))
            keep = ~np.isin(d, changed, assume_unique=False)
            if with_pos:
                p = decode_positions(row["pos_blob"], t)
                pos_keep = np.repeat(keep, t)
                pos_parts.append(p[pos_keep])
            ids_parts.append(d[keep])
            tf_parts.append(t[keep])
            dl_parts.append(l[keep])
        newr = pdf[pdf["kind"] == 1].sort_values("start_docid")
        if len(newr):
            ids_parts.append(newr["start_docid"].to_numpy(dtype=np.int64))
            tf_parts.append(newr["tf"].to_numpy(dtype=np.int64))
            dl_parts.append(newr["dl"].to_numpy(dtype=np.int64))
            if with_pos:
                pos_parts.extend(
                    np.asarray(p, dtype=np.int64) for p in newr["pos"].to_numpy()
                )
        cols = ["term_bucket", "term", "salt", "start_docid", "n", "max_tf", "min_dl", "blob"]
        if with_pos:
            cols.append("pos_blob")
        out_cols = ["wave"] + cols
        if not ids_parts:
            return pd.DataFrame(columns=out_cols)
        ids = np.concatenate(ids_parts)
        tfs = np.concatenate(tf_parts)
        dls = np.concatenate(dl_parts)
        if len(ids) == 0:
            return pd.DataFrame(columns=out_cols)
        order = np.argsort(ids, kind="stable")
        ids, tfs, dls = ids[order], tfs[order], dls[order]
        if with_pos:
            flat = (
                np.concatenate(pos_parts)
                if pos_parts and sum(len(p) for p in pos_parts)
                else np.zeros(0, dtype=np.int64)
            )
            # re-segment the flat position stream by pre-sort tf counts,
            # then reorder the segments to match the docid sort
            pre_tfs = np.concatenate(tf_parts)
            seg_ends = np.cumsum(pre_tfs)
            segs = np.split(flat, seg_ends[:-1]) if len(pre_tfs) else []
            segs = [segs[i] for i in order]
            flat = np.concatenate(segs) if segs else np.zeros(0, dtype=np.int64)
        rows = []
        for s in range(0, len(ids), block_size):
            e = min(s + block_size, len(ids))
            row = (
                int(wave), int(tb), term, int(salt), int(ids[s]), e - s,
                int(tfs[s:e].max()), int(dls[s:e].min()),
                encode_block(ids[s:e], tfs[s:e], dls[s:e]),
            )
            if with_pos:
                cs = int(np.sum(tfs[:s]))
                ce = cs + int(np.sum(tfs[s:e]))
                row = row + (encode_positions(flat[cs:ce], tfs[s:e]),)
            rows.append(row)
        return pd.DataFrame(rows, columns=out_cols)

    return fn
