"""Search across multiple indexes — ES multi-index requests.

ES lets one search address several concrete indexes (``GET a,b,c/_search``
or an alias spanning them); with ``dfs_query_then_fetch`` the ranking is
identical to a single merged index because term/corpus statistics are
globalized in a first pass. This module is that contract for any set of
this engine's self-describing index directories — the date-routed layout
(plans/date_routed.py) and rollover generations (plans/alias.py) are the
two in-repo producers of such sets.

Scale shape: the dfs pass is O(indexes) driver-side *tiny* reads (one
cached corpus_stats row + one row-group-pruned term_dict lookup per
index, never a data scan); scoring fans out the standard partition-pruned
postings decode per index and merges with one TakeOrdered. The per-index
loop builds the plan, not the data — 10^2-10^3 indexes is the practical
regime (days, generations), each of unbounded size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..operators.query import (
    _decode_scores,
    _matching_blocks,
    corpus_stats,
    deleted_docids,
    effective_config,
    query_terms,
    term_buckets_of,
)
from ..sources import tables as tbl


def bm25_topk_across(
    spark: SparkSession,
    indexes: dict[str, str],
    query: str,
    k: int = 10,
    cfg: IndexConfig | None = None,
    label_col: str = "index",
    boosts: dict[str, float] | None = None,
) -> DataFrame:
    """Global-statistics (dfs_query_then_fetch) BM25 top-k over several
    indexes: rank-identical to one monolithic index holding the union of
    their documents. ``indexes`` maps label → index dir. Output:
    (label_col, docid, score), ties (score desc, label asc, docid asc) —
    docids are only unique per index.

    ``boosts`` (label → factor) is ES ``indices_boost``: each member
    index's scores are multiplied by its factor before the merged ranking
    (promote fresh generations over archived ones); unlisted labels keep
    factor 1.0.
    """
    terms = query_terms(query)
    empty = tbl.local_rows_df(spark, [], f"{label_col} string, docid long, score double")
    if not indexes or not terms:
        return empty

    # dfs pass: global N, avgdl, df(term) across every member index
    n_docs = 0
    sum_dl = 0
    df_of: dict[str, int] = {}
    for d in indexes.values():
        st = corpus_stats(spark, d)
        n_docs += st["n_docs"]
        sum_dl += st["sum_dl"]
        for r in (
            spark.read.parquet(tbl.p(d, "term_dict"))
            .filter(F.col("term").isin(terms))
            .select("term", "df")
            .collect()
        ):
            df_of[r["term"]] = df_of.get(r["term"], 0) + int(r["df"])
    if not df_of or not n_docs:
        return empty
    avgdl = sum_dl / n_docs
    idf = {
        t: float(np.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))) for t, d in df_of.items()
    }
    live = sorted(idf)

    parts = []
    for label, d in indexes.items():
        pcfg = effective_config(spark, d, cfg)
        buckets = sorted(set(term_buckets_of(spark, live, pcfg.term_buckets).values()))
        blocks = _matching_blocks(spark, d, live, buckets)
        scored = _decode_scores(blocks, idf, pcfg, avgdl, deleted_docids(spark, d))
        factor = float((boosts or {}).get(label, 1.0))
        if factor != 1.0:
            scored = scored.withColumn("score", F.col("score") * F.lit(factor))
        parts.append(scored.select(F.lit(label).alias(label_col), "docid", "score"))
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out.orderBy(F.desc("score"), F.asc(label_col), F.asc("docid")).limit(k)
