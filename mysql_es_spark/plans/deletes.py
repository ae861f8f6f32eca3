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
from ..operators.query import deleted_docids, effective_config
from ..sources import tables as tbl
from .metrics import append_metrics


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
    not re-recorded (idempotent re-runs append nothing)."""
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
