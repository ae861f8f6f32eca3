"""Soft deletes — ES ``_delete_by_query`` + Lucene live-docs semantics.

The reference deletes synced docs from ES when binlog DELETE rows arrive
(Es.java bulk delete actions); ES in turn soft-deletes: the doc is masked
from every search immediately, but segment files, corpus statistics and
postings stay untouched until a merge physically purges them. This module
reproduces that contract for our index layout:

- :func:`delete_by_query` appends matching docids to a small ``deletes``
  table under the index dir. Every query path masks against it
  (operators/query.py ``_mask_deleted``) BEFORE top-k selection, while
  idf/avgdl deliberately still count the deleted docs — exactly ES's
  pre-merge scoring.
- physical purge happens in ``plans.compact.compact_index`` (the
  ``_forcemerge`` analog): postings/forward/doc_lens are rewritten
  without the deleted docs and term_dict/corpus_stats are recomputed, so
  post-merge scores shift the same way they do in ES.

Scale shape: the matched docid set is decoded from the query terms'
postings only (query-proportional); the append is a columnar write of
that narrow set; masking is a broadcastable anti-join (the deletes table
is tiny relative to the corpus between merges — Lucene assumes the same).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..operators.aggs import _matched_docids
from ..operators.docids import with_bucket
from ..operators.query import deleted_docids, effective_config
from ..sources import tables as tbl
from .metrics import append_metrics


def reindex(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    query: str = "",
    doc_filter: str | None = None,
    dst_cfg: IndexConfig | None = None,
) -> dict:
    """ES ``_reindex``: build a brand-new index at ``dst_dir`` from the
    subset of ``src_dir``'s live docs matching ``query`` (fulltext) and/or
    ``doc_filter`` (forward predicate); no selector copies every live doc.
    The destination may use a different physical config (``dst_cfg``) —
    ES reindex-into-new-settings, e.g. turning positions on, changing
    bucket counts — because the docs are re-tokenized from the stored
    source, exactly like ES re-ingesting ``_source``.

    Soft-deleted docs never cross (the mask applies to the source read),
    so reindex doubles as a purge. Plan: one column-pruned forward scan +
    (for a query) a docid semi-join against the query-proportional
    matched set — then the standard wave build; nothing driver-side.
    Returns the build metrics plus docs_selected."""
    from .build import FORWARD_COLS, build_index

    src_cfg = effective_config(spark, src_dir, None)
    cols = [c for c in FORWARD_COLS if c not in ("docid", "doc_key", "bucket")]
    fwd = tbl.read(spark, src_dir, "forward")
    existing = deleted_docids(spark, src_dir)
    if existing is not None:
        fwd = fwd.join(existing, "docid", "left_anti")
    if doc_filter is not None:
        fwd = fwd.filter(F.expr(doc_filter))
    if query:
        matched = _matched_docids(spark, src_dir, query, src_cfg)
        if matched is None:
            fwd = fwd.filter(F.lit(False))
        else:
            fwd = fwd.join(matched, "docid", "left_semi")
    docs = fwd.select(*cols)
    stats = build_index(spark, docs, dst_dir, dst_cfg or src_cfg)
    n = spark.read.parquet(tbl.p(dst_dir, "corpus_stats")).collect()[0]["n_docs"]
    append_metrics(
        spark, dst_dir, "reindex", {"docs_selected": int(n)}, wave=-1, batch_id=-1
    )
    return {**stats, "docs_selected": int(n)}


def delete_by_query(
    spark: SparkSession,
    index_dir: str,
    query: str = "",
    doc_filter: str | None = None,
    cfg: IndexConfig | None = None,
) -> int:
    """Soft-delete every doc matching ``query`` (fulltext, disjunctive)
    and/or ``doc_filter`` (a SQL predicate over the forward columns).
    Both given = AND of the two (the ES request body's query+filter).
    Returns the number of newly deleted docs; already-deleted docs are
    not re-recorded (idempotent re-runs append nothing).

    Scope: one index directory. A date-routed layout (plans/date_routed)
    is a family of per-period indexes — delete per period, exactly like
    ES deletes address one concrete index behind an alias."""
    if not query and doc_filter is None:
        raise ValueError("delete_by_query needs a query and/or a doc_filter")
    cfg = effective_config(spark, index_dir, cfg)
    t0 = time.monotonic()

    matched: DataFrame | None = None
    if query:
        # already masked against existing deletes — only live docs match
        matched = _matched_docids(spark, index_dir, query, cfg)
        if matched is None:
            return 0
    if doc_filter is not None:
        fwd = (
            tbl.read(spark, index_dir, "forward")
            .filter(F.expr(doc_filter))
            .select("docid")
        )
        matched = fwd if matched is None else matched.join(fwd, "docid", "left_semi")
        existing = deleted_docids(spark, index_dir)
        if existing is not None:
            matched = matched.join(existing, "docid", "left_anti")

    n = matched.count()
    if n:
        # narrow docid column; a handful of files per delete batch is
        # plenty even when a merge-due index holds billions of deletes
        matched.select("docid").repartition(
            max(1, min(32, n // 5_000_000 + 1))
        ).write.mode("append").parquet(tbl.p(index_dir, "deletes"))
    append_metrics(
        spark,
        index_dir,
        "delete_by_query",
        {"docs_deleted": int(n), "wall_ms": int((time.monotonic() - t0) * 1000)},
        wave=-1,
        batch_id=-1,
    )
    return int(n)


def update_by_query(
    spark: SparkSession,
    index_dir: str,
    set_exprs: dict[str, str],
    query: str = "",
    doc_filter: str | None = None,
    cfg: IndexConfig | None = None,
) -> dict:
    """ES ``_update_by_query``: apply ``set_exprs`` (column → SQL
    expression over the forward columns, the painless-script analog; the
    reference generates exactly such update scripts for relation
    propagation, Emiter.java painless SET codegen) to every live doc
    matching ``query`` (fulltext) and/or ``doc_filter`` (forward
    predicate), then make the result searchable.

    Like ES — which internally re-indexes each matched doc — the changed
    docs' buckets are rebuilt from the updated snapshot via the
    incremental machinery, so postings, doc_lens and corpus stats all
    reflect a ``text`` update, and a metadata-only update keeps scores
    identical (same tokens → same stats). Soft-deleted docs are excluded
    from the rebuild snapshot, so a rebuilt bucket physically drops them
    (never resurrects — matching ES, where update_by_query skips deleted
    docs and the rebuild is a merge).

    Identity columns (conv_id, turn_idx) and physical columns cannot be
    set — an update never moves a doc between buckets or re-keys it
    (ES: ``_id`` is immutable under update_by_query).

    Scale shape: matched docids are query-proportional; the snapshot is
    one column-pruned forward scan with a left join against the matched
    set (broadcastable — matched is narrow); only affected waves are
    rewritten. Returns docs_updated + the rebuild summary.
    """
    from ..plans.build import FORWARD_COLS
    from ..streaming.incremental import incremental_update

    forbidden = {"conv_id", "turn_idx", "docid", "doc_key", "bucket"}
    bad = forbidden.intersection(set_exprs)
    if bad:
        raise ValueError(f"update_by_query cannot set identity/physical columns: {sorted(bad)}")
    unknown = set(set_exprs) - set(FORWARD_COLS)
    if unknown:
        raise ValueError(f"unknown forward columns: {sorted(unknown)}")
    if not query and doc_filter is None:
        raise ValueError("update_by_query needs a query and/or a doc_filter")
    cfg = effective_config(spark, index_dir, cfg)
    t0 = time.monotonic()

    matched: DataFrame | None = None
    if query:
        matched = _matched_docids(spark, index_dir, query, cfg)
        if matched is None:
            return {"docs_updated": 0, "waves_rebuilt": [], "buckets": []}
    if doc_filter is not None:
        fwd_m = (
            tbl.read(spark, index_dir, "forward")
            .filter(F.expr(doc_filter))
            .select("docid")
        )
        matched = fwd_m if matched is None else matched.join(fwd_m, "docid", "left_semi")
        existing = deleted_docids(spark, index_dir)
        if existing is not None:
            matched = matched.join(existing, "docid", "left_anti")
    n = matched.count()
    if n == 0:
        return {"docs_updated": 0, "waves_rebuilt": [], "buckets": []}

    fwd = tbl.read(spark, index_dir, "forward")
    dels = deleted_docids(spark, index_dir)
    if dels is not None:
        fwd = fwd.join(dels, "docid", "left_anti")
    flagged = fwd.join(matched.withColumn("__upd", F.lit(1)), "docid", "left")
    cols = [c for c in FORWARD_COLS if c not in ("docid", "doc_key", "bucket")]
    snapshot = flagged.select(
        *[
            F.when(F.col("__upd") == 1, F.expr(set_exprs[c]))
            .otherwise(F.col(c))
            .cast(dict(fwd.dtypes)[c])
            .alias(c)
            if c in set_exprs
            else F.col(c)
            for c in cols
        ],
        F.coalesce(F.col("__upd"), F.lit(0)).alias("__upd"),
    )
    # the rebuild overwrites the very forward/postings files this plan
    # reads — materialize the rebuild input first. Only affected buckets
    # get rebuilt, so only their rows are staged (query-proportional, not
    # a full-corpus copy); a real deployment's Iceberg snapshot isolation
    # would make this staging unnecessary.
    changed_buckets = with_bucket(
        snapshot.filter(F.col("__upd") == 1).select("conv_id"), cfg
    ).select("bucket").distinct()
    # non-dot/underscore name: Spark reads explicit dot-paths but warns
    # ("all paths were ignored"); inside the index dir so a cluster
    # deployment stages on the same shared filesystem. Removed in the
    # finally below; never matches a table name tbl.read would load.
    staged_path = tbl.p(index_dir, "upd-snapshot.tmp")
    with_bucket(snapshot, cfg).join(
        F.broadcast(changed_buckets), "bucket", "left_semi"
    ).drop("bucket").write.mode("overwrite").parquet(staged_path)
    try:
        staged = spark.read.parquet(staged_path)
        res = incremental_update(
            spark,
            staged.select(*cols),
            staged.filter(F.col("__upd") == 1).select("conv_id"),
            index_dir,
            cfg,
        )
    finally:
        import shutil

        shutil.rmtree(staged_path, ignore_errors=True)
    append_metrics(
        spark,
        index_dir,
        "update_by_query",
        {"docs_updated": int(n), "wall_ms": int((time.monotonic() - t0) * 1000)},
        wave=-1,
        batch_id=-1,
    )
    # the exact matched count wins the key collision: the posting-merge
    # fast path reports its own docs_updated = docs REWRITTEN (every turn
    # of each changed conv), which is the physical-rebuild width, not the
    # ES _update_by_query "updated" count
    return {**res, "docs_updated": int(n)}
