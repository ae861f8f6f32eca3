"""Segment compaction — merge a many-wave index into one optimized wave.

Every build wave and every incremental batch (streaming/incremental.py)
writes its own wave directory. Queries stay correct over any number of
waves — buckets own disjoint docid ranges, so a (term, salt) group never
spans waves — but the layout degrades operationally as waves accumulate:
file listings multiply (waves × term_bucket dirs), per-wave doc_lens /
term_stats partials pile up, and Arrow-batch boundaries inside a wave
leave short split block runs. Lucene solves the same problem with
background segment merging (forceMerge); ES exposes it as `_forcemerge`
— the reference relies on it implicitly by delegating storage to ES.
What compaction buys here is I/O shape, not semantics: one wave, packed
blocks (Arrow-split runs re-merged), one doc_lens/term_stats file set,
single-row lineage.

``compact_index`` is that operation for this engine: decode every
posting block back to (docid, term, tf, dl[, pos]) rows — never
re-tokenizing, the expensive part of a build — and re-run the standard
encode path into a single wave of fully-packed, globally-sorted blocks.
One shuffle by (term_bucket, term, salt), same as a build wave; the
forward/doc_lens/term_stats tables are columnar copies/re-aggregations.
The result is a brand-new index directory: the source stays live for
queries until the caller swaps paths (the atomic-rename step an
orchestrator would do), which also makes compaction trivially resumable
— a crashed compaction is just a directory to delete.
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..functions.codecs import decode_block, decode_positions
from ..operators.postings import (
    TOKENIZED_POS_SCHEMA,
    TOKENIZED_SCHEMA,
    posting_blocks,
)
from ..operators.query import deleted_docids, effective_config, invalidate_stats_cache
from ..sources import tables as tbl
from .build import FORWARD_COLS, finalize
from .metrics import append_metrics


def decoded_postings(spark: SparkSession, index_dir: str, cfg: IndexConfig) -> DataFrame:
    """All posting blocks decoded back to exploded (docid, term, tf, dl
    [, pos]) rows — the inverse of the encode stage, vectorized per block."""
    with_pos = cfg.with_positions
    cols = ["term", "n", "blob"] + (["pos_blob"] if with_pos else [])

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms_out, ids_out, tfs_out, dls_out, pos_out = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                ids, tfs, dls = decode_block(row.blob, int(row.n))
                terms_out.append(np.full(len(ids), row.term, dtype=object))
                ids_out.append(ids)
                tfs_out.append(tfs)
                dls_out.append(dls)
                if with_pos:
                    flat = decode_positions(row.pos_blob, tfs)
                    bounds = np.cumsum(tfs)[:-1]
                    pos_out.extend(np.split(flat.astype(np.int32), bounds))
            if not ids_out:
                continue
            out = {
                "docid": np.concatenate(ids_out),
                "term": np.concatenate(terms_out),
                "tf": np.concatenate(tfs_out).astype(np.int32),
                "dl": np.concatenate(dls_out).astype(np.int32),
            }
            if with_pos:
                out["pos"] = pos_out
            yield pd.DataFrame(out)

    schema = TOKENIZED_POS_SCHEMA if with_pos else TOKENIZED_SCHEMA
    return (
        tbl.read(spark, index_dir, "postings")
        .select(*cols)
        .mapInPandas(dec, schema=schema)
    )


# physical knobs a reshard may change: all three are pure functions of
# (docid, term) recomputed by the encode path — docids, positions, and the
# forward layout (n_buckets) never move, so no re-tokenize is needed
_RESHARD_KEYS = frozenset({"salt_docs", "term_buckets", "block_size"})


def compact_index(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    cfg: IndexConfig | None = None,
    purge_deletes: bool = True,
    reshard: dict | None = None,
) -> dict:
    """Rewrite ``src_dir`` as a single-wave optimized index at ``dst_dir``.

    With no soft deletes (or ``purge_deletes=False``) query results over
    ``dst_dir`` are byte-identical to ``src_dir`` (same docids, scores,
    positions); only the physical layout changes. With ``purge_deletes``
    and a ``deletes`` table present, the merge physically drops the
    deleted docs — postings/forward/doc_lens are rewritten without them
    and term_dict/corpus_stats recomputed from the survivors, so idf and
    avgdl shift exactly as ES/Lucene scores shift after a merge. The
    compacted index carries no deletes table.

    ``reshard`` is the ES ``_split``/``_shrink`` analog: a dict of new
    physical settings (``salt_docs``, ``term_buckets``, ``block_size``)
    the re-encode applies — repartitioning a built index for a different
    cluster width or query fan-out WITHOUT re-tokenizing (the expensive
    stage). Docids, scores, and positions are unchanged; the new layout
    is persisted in the destination's index_meta, so queries pick it up
    automatically. Returns {blocks_before, blocks_after, n_docs,
    docs_purged}.
    """
    t0 = time.monotonic()
    cfg = effective_config(spark, src_dir, cfg)
    if reshard:
        bad = set(reshard) - _RESHARD_KEYS
        if bad:
            raise ValueError(
                f"reshard can only change {sorted(_RESHARD_KEYS)}, got {sorted(bad)}"
            )
        cfg = cfg.with_(**{k: int(v) for k, v in reshard.items()})
    dels = deleted_docids(spark, src_dir) if purge_deletes else None
    docs_purged = int(dels.count()) if dels is not None else 0
    if docs_purged == 0:
        dels = None

    def live(df: DataFrame) -> DataFrame:
        return df if dels is None else df.join(dels, "docid", "left_anti")

    width = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "64")),
        spark.sparkContext.defaultParallelism,
    )

    # postings: decode → (purge) → standard encode path → one packed wave
    tok = live(decoded_postings(spark, src_dir, cfg))
    posting_blocks(tok, cfg).write.partitionBy("term_bucket").mode("overwrite").parquet(
        tbl.wave_dir(dst_dir, "postings", 0)
    )

    # doc_lens / term_stats: re-aggregate the per-wave partials; under a
    # purge the partials still count deleted docs, so term_stats must be
    # recomputed from the surviving exploded postings instead
    live(tbl.read(spark, src_dir, "doc_lens").select("docid", "dl")).coalesce(
        max(1, width // 4)
    ).write.mode("overwrite").parquet(tbl.wave_dir(dst_dir, "doc_lens", 0))
    if dels is None:
        (
            tbl.read(spark, src_dir, "term_stats")
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
            .write.mode("overwrite")
            .parquet(tbl.wave_dir(dst_dir, "term_stats", 0))
        )
    else:
        (
            live(decoded_postings(spark, src_dir, cfg))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf"))
            .write.mode("overwrite")
            .parquet(tbl.wave_dir(dst_dir, "term_stats", 0))
        )

    # forward: columnar copy, re-sorted so parquet row-group stats keep
    # pruning docid point-fetches (_with_keys) and bucket scans
    (
        live(tbl.read(spark, src_dir, "forward").select(*FORWARD_COLS))
        .repartition(width, "bucket")
        .sortWithinPartitions("docid")
        .write.mode("overwrite")
        .parquet(tbl.wave_dir(dst_dir, "forward", 0))
    )

    # lineage: one row covering every bucket — resume over the compacted
    # index sees a complete build
    buckets = list(range(cfg.n_buckets))
    n_docs = spark.read.parquet(tbl.wave_dir(dst_dir, "doc_lens", 0)).count()
    before = tbl.read(spark, src_dir, "postings").count()
    after = spark.read.parquet(tbl.wave_dir(dst_dir, "postings", 0)).count()
    npost = int(
        spark.read.parquet(tbl.wave_dir(dst_dir, "postings", 0))
        .agg(F.coalesce(F.sum("n"), F.lit(0)))
        .collect()[0][0]
    )
    tbl.local_rows_df(
        spark,
        [(0, buckets, int(n_docs), npost, int(after), time.monotonic() - t0,
          "complete", datetime.now(timezone.utc))],
        tbl.LINEAGE_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(tbl.p(dst_dir, "lineage"))

    if dels is None and tbl.exists(src_dir, "deletes"):
        # not purging (or nothing recorded): the live-docs mask must ride
        # along or soft-deleted docs would resurface in the new index
        tbl.read(spark, src_dir, "deletes").coalesce(1).write.mode("overwrite").parquet(
            tbl.p(dst_dir, "deletes")
        )

    invalidate_stats_cache(dst_dir)
    finalize(spark, dst_dir, cfg)
    append_metrics(
        spark,
        dst_dir,
        "compact",
        {
            "docs_indexed": int(n_docs),
            "postings_written": npost,
            "blocks_written": int(after),
            "blocks_before": int(before),
            "docs_purged": docs_purged,
            "wall_ms": int((time.monotonic() - t0) * 1000),
        },
        wave=0,
        batch_id=-1,
    )
    return {
        "blocks_before": int(before),
        "blocks_after": int(after),
        "n_docs": int(n_docs),
        "docs_purged": docs_purged,
    }


def merge_indexes(
    spark: SparkSession,
    src_dirs: list[str],
    dst_dir: str,
    cfg: IndexConfig | None = None,
    on_dup: str = "error",
) -> dict:
    """Cross-index forcemerge: N built indexes → one optimized index,
    WITHOUT re-tokenizing.

    Lucene merges segments of one index; a data stream's generations (or
    any rollover family) are separate indexes, and their docids collide —
    every index assigns bucket-local docids from the same static ranges
    (operators/docids.py). So the merge must re-key identity: the union
    of live forward rows gets fresh docids from the standard assignment,
    each source's postings decode back to (docid, term, tf, dl[, pos])
    rows, remap (source, old docid) → new docid with one equi-join, and
    the standard encode path packs one global wave. Token streams are
    never recomputed — the analyzer/scoring config must therefore be
    identical across sources (checked; physical layout is free to change,
    the reshard contract).

    ``on_dup``: a ``doc_key`` present in several sources is an ``error``
    by default; ``"last"`` keeps the row from the LATEST source in
    ``src_dirs`` order (its postings too — the loser's rows drop out of
    the inner remap join). Soft-deleted docs never cross (the merge is a
    purge, as _forcemerge is). Returns {n_docs, sources, dup_policy}.
    """
    import functools

    from ..operators.docids import assign_docids, with_bucket

    if len(src_dirs) < 2:
        raise ValueError("merge_indexes needs at least 2 sources")
    if on_dup not in ("error", "last"):
        raise ValueError(f"on_dup must be 'error' or 'last', got {on_dup!r}")
    t0 = time.monotonic()
    cfgs = [effective_config(spark, d, None) for d in src_dirs]

    def _analyzer(c: IndexConfig):
        return (
            c.with_positions, c.edge_ngram, c.edge_ngram_min, c.edge_ngram_max,
            tuple(c.synonyms), c.k1, c.b,
        )

    for d, c in zip(src_dirs[1:], cfgs[1:]):
        if _analyzer(c) != _analyzer(cfgs[0]):
            raise ValueError(
                f"{d}: analyzer/scoring config differs from {src_dirs[0]} — "
                "a merge cannot mix token streams (reindex instead)"
            )
    cfg = cfg or cfgs[0]
    if _analyzer(cfg) != _analyzer(cfgs[0]):
        raise ValueError("cfg overrides may not change analyzer/scoring fields")

    from pyspark.sql import Window

    fwds = []
    for i, d in enumerate(src_dirs):
        f = tbl.read(spark, d, "forward").select(*FORWARD_COLS)
        dels = deleted_docids(spark, d)
        if dels is not None:
            f = f.join(dels, "docid", "left_anti")
        fwds.append(f.withColumn("_src", F.lit(i)))
    all_fwd = functools.reduce(lambda a, b: a.unionByName(b), fwds)
    if on_dup == "error":
        dup = all_fwd.groupBy("doc_key").agg(F.count(F.lit(1)).alias("c")).filter("c > 1")
        if dup.limit(1).count():
            raise ValueError(
                "doc_key duplicated across sources — pass on_dup='last' to "
                "keep the latest source's row"
            )
    else:
        w = Window.partitionBy("doc_key").orderBy(F.col("_src").desc())
        all_fwd = (
            all_fwd.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    # fresh identity space, the same scheme as a new build
    keyed = assign_docids(
        with_bucket(
            all_fwd.select(
                "conv_id", "turn_idx", "role", "text", "tool", "ts",
                "_src", F.col("docid").alias("_old_docid"),
            ),
            cfg,
        ),
        cfg,
    )
    mapping = keyed.select("_src", "_old_docid", F.col("docid").alias("_new_docid"))

    width = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "64")),
        spark.sparkContext.defaultParallelism,
    )
    (
        keyed.select(*FORWARD_COLS)
        .repartition(width, "bucket")
        .sortWithinPartitions("docid")
        .write.mode("overwrite")
        .parquet(tbl.wave_dir(dst_dir, "forward", 0))
    )

    tok_cols = ["docid", "term", "tf", "dl"] + (["pos"] if cfg.with_positions else [])
    toks = [
        decoded_postings(spark, d, cfgs[i]).withColumn("_src", F.lit(i))
        for i, d in enumerate(src_dirs)
    ]
    tok_all = functools.reduce(lambda a, b: a.unionByName(b), toks)
    tok_new = (
        tok_all.withColumnRenamed("docid", "_old_docid")
        # inner: deleted docs and duplicate losers have no mapping row
        .join(mapping, ["_src", "_old_docid"], "inner")
        .withColumnRenamed("_new_docid", "docid")
        .select(*tok_cols)
    )
    posting_blocks(tok_new, cfg).write.partitionBy("term_bucket").mode(
        "overwrite"
    ).parquet(tbl.wave_dir(dst_dir, "postings", 0))

    dls = [
        tbl.read(spark, d, "doc_lens")
        .select(F.col("docid").alias("_old_docid"), "dl")
        .withColumn("_src", F.lit(i))
        for i, d in enumerate(src_dirs)
    ]
    (
        functools.reduce(lambda a, b: a.unionByName(b), dls)
        .join(mapping, ["_src", "_old_docid"], "inner")
        .select(F.col("_new_docid").alias("docid"), "dl")
        .coalesce(max(1, width // 4))
        .write.mode("overwrite")
        .parquet(tbl.wave_dir(dst_dir, "doc_lens", 0))
    )
    (
        tok_new.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf"))
        .write.mode("overwrite")
        .parquet(tbl.wave_dir(dst_dir, "term_stats", 0))
    )

    n_docs = spark.read.parquet(tbl.wave_dir(dst_dir, "doc_lens", 0)).count()
    tbl.local_rows_df(
        spark,
        [(0, list(range(cfg.n_buckets)), int(n_docs), 0, 0,
          time.monotonic() - t0, "complete", datetime.now(timezone.utc))],
        tbl.LINEAGE_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(tbl.p(dst_dir, "lineage"))

    invalidate_stats_cache(dst_dir)
    finalize(spark, dst_dir, cfg)
    append_metrics(
        spark, dst_dir, "merge",
        {"docs_indexed": int(n_docs), "sources": len(src_dirs),
         "wall_ms": int((time.monotonic() - t0) * 1000)},
        wave=0, batch_id=-1,
    )
    return {"n_docs": int(n_docs), "sources": len(src_dirs), "dup_policy": on_dup}
