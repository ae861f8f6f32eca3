"""Date-routed index layout — the reference's per-day index routing (W3).

mysql-es routes each document to a dated ES index via date-math on a
timestamp field (River.java:275-296 DynamicIndexField.buildIndexName:
``logs-${created_at|yyyy.MM.dd}`` → ``logs-2023.01.15``), giving cheap
retention (drop a day's index) and time-bounded search (open only the
in-range indices). The Spark-first analog is a **period dimension above
the index**: ``root/period=2023-01-15/`` each a full, self-describing
index built by the battle-tested plans.build pipeline.

Semantics note: ES ``query_then_fetch`` (the default) computes IDF per
shard/index, so a search over ``logs-2023.01.*`` merges hits scored with
*per-index* statistics. The routed query here does exactly that — per-
period BM25 top-k, merged by (score desc, docid asc) — which is the
reference's observable behavior, not an approximation of it.

Scale: daily ingest builds only the new period (bounded work, the same
wave/lineage resume contract inside); retention is a directory delete
(no rewrite, no tombstones); a time-bounded query constructs a plan that
reads **only** the in-range period directories — coarse-grained
partition pruning audited by tests/test_date_routed.py via
``inputFiles()``. The per-period loop is driver-side but O(periods), not
O(rows): ~365 iterations/year regardless of corpus size.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..sources import tables as tbl
from .build import build_index

ROUTING_META_SCHEMA = "ts_col string, fmt string"
_PERIOD_PREFIX = "period="


def _period_dir(root: str, period: str) -> str:
    return os.path.join(root, f"{_PERIOD_PREFIX}{period}")


def list_periods(root: str) -> list[str]:
    """Sorted period values present under ``root`` (directory listing —
    the routed layout's 'catalog'; on an object store this is one LIST)."""
    if not os.path.isdir(root):
        return []
    return sorted(
        d[len(_PERIOD_PREFIX):]
        for d in os.listdir(root)
        if d.startswith(_PERIOD_PREFIX) and os.path.isdir(os.path.join(root, d))
    )


def routing_meta(spark: SparkSession, root: str) -> dict:
    row = spark.read.parquet(os.path.join(root, "routing_meta")).collect()[0]
    return {"ts_col": row["ts_col"], "fmt": row["fmt"]}


def build_date_routed(
    spark: SparkSession,
    transcripts: DataFrame,
    root: str,
    cfg: IndexConfig | None = None,
    ts_col: str = "ts",
    fmt: str = "yyyy-MM-dd",
    periods: list[str] | None = None,
) -> dict:
    """Route documents by ``date_format(ts_col, fmt)`` and build one
    sub-index per period. ``periods=None`` builds every period present in
    the input; pass an explicit list for daily ingest (build just today).

    Each period's build filters the input on the period value — with the
    input parquet/Iceberg partitioned by the same date this filter is
    partition pruning, not a rescan (the same contract as plans.build's
    bucket waves)."""
    cfg = cfg or IndexConfig()
    routed = transcripts.withColumn("__period", F.date_format(F.col(ts_col), fmt))
    if periods is None:
        periods = sorted(
            r["__period"] for r in routed.select("__period").distinct().collect()
        )
    built = {}
    for p in periods:
        sub = routed.filter(F.col("__period") == p).drop("__period")
        built[p] = build_index(spark, sub, _period_dir(root, p), cfg)
    tbl.local_rows_df(spark, [(ts_col, fmt)], ROUTING_META_SCHEMA).coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(root, "routing_meta"))
    return {"periods_built": periods, "per_period": built}


def select_periods(
    root: str, start: str | None = None, end: str | None = None
) -> list[str]:
    """Periods in [start, end] — lexicographic compare, valid for the
    default yyyy-MM-dd (and any zero-padded big-endian) format."""
    return [
        p
        for p in list_periods(root)
        if (start is None or p >= start) and (end is None or p <= end)
    ]


def bm25_topk_routed(
    spark: SparkSession,
    root: str,
    query: str,
    k: int = 10,
    start: str | None = None,
    end: str | None = None,
    cfg: IndexConfig | None = None,
    mode: str = "pruned",
    with_keys: bool = False,
) -> DataFrame:
    """Time-bounded BM25 over the routed layout: per-period top-k (each
    scored with its own sub-index statistics — the ES query_then_fetch
    contract), merged to a global (score desc, docid asc) top-k. Output:
    (period, docid, score), plus the forward keys when ``with_keys``.
    Only in-range period directories are read."""
    from ..operators.query import bm25_topk

    chosen = select_periods(root, start, end)
    if not chosen:
        schema = "period string, docid long, score double"
        if with_keys:
            schema += ", conv_id string"
        return tbl.local_rows_df(spark, [], schema)
    cols = ["docid", "score"] + (["conv_id"] if with_keys else [])
    parts = [
        bm25_topk(
            spark, _period_dir(root, p), query, k=k, cfg=cfg, mode=mode,
            with_keys=with_keys,
        )
        .select(F.lit(p).alias("period"), *cols)
        for p in chosen
    ]
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def bm25_topk_routed_dfs(
    spark: SparkSession,
    root: str,
    query: str,
    k: int = 10,
    start: str | None = None,
    end: str | None = None,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``dfs_query_then_fetch`` over the routed layout: a first
    metadata-only pass gathers GLOBAL statistics across the in-range
    periods — Σ df per term (one pruned term_dict read per period), Σ
    n_docs / Σ dl (cached corpus_stats rows) — then every period scores
    with those global idf/avgdl. Result: rank-identical to one monolithic
    index over the same date range, while keeping the routed layout's
    build/retention/pruning wins. (ES pays the same extra round-trip for
    the same exactness; the dfs pass here is O(periods) driver-side tiny
    reads, no data scan.) Output: (period, docid, score); ties break
    (score desc, period asc, docid asc) — docids are only unique per
    period."""
    from .multi_index import bm25_topk_across

    chosen = select_periods(root, start, end)
    return bm25_topk_across(
        spark,
        {p: _period_dir(root, p) for p in chosen},
        query,
        k=k,
        cfg=cfg,
        label_col="period",
    )


def drop_periods_before(root: str, cutoff: str) -> list[str]:
    """Retention: delete every period strictly before ``cutoff``. The
    routed layout makes this a directory delete — no index rewrite, the
    surviving periods' statistics are untouched (exactly the reference's
    drop-old-index operational model)."""
    dropped = [p for p in list_periods(root) if p < cutoff]
    for p in dropped:
        shutil.rmtree(_period_dir(root, p))
        from ..operators.query import invalidate_stats_cache

        invalidate_stats_cache(_period_dir(root, p))
    return dropped
