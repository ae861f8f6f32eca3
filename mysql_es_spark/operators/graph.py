"""ES Graph ``_explore``: spidering significant term connections.

The Graph API answers "which terms are meaningfully connected to this
query, and to each other?" by iterating: find the seed query's
significant terms (vertices), then the significant terms of THOSE
terms' documents (the next wave), recording co-occurrence strengths as
connections — with already-seen vertices excluded from later waves, so
the spider expands instead of echoing (docs.elastic.co Graph explore;
the reference's docs land in X-Pack-capable ES where this API is one
hop away).

Spark-first realization:
- Each wave is the already-proven significant_terms plan: one
  presence-only postings decode for the frontier's match set, one
  tokenize pass over the matched docs, a short-key equi-join against
  term_dict for background frequencies — query-proportional work, never
  corpus-proportional.
- Connections come from the SAME matched-docs tokenize output: doc→term
  pairs restricted to (frontier ∪ new vertices), self-joined on docid —
  a bounded |frontier| × |new| fan-out, each pair's doc_count exact.
- Per-wave vertex lists are ≤ ``top_vertices`` rows on the driver (the
  iteration control ES also runs coordinator-side); document sets never
  leave the cluster.

Determinism: vertices rank by (jlh rounded desc, term asc); connections
are exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..sources import tables as tbl
from .aggs import _matched_docids, significant_terms
from .query import effective_config

VERTICES_SCHEMA = "term string, depth int, fg_df long, bg_df long, jlh double"
CONNECTIONS_SCHEMA = "source string, target string, doc_count long"


def _cooccurrence(
    spark: SparkSession,
    index_dir: str,
    frontier: list[str],
    targets: list[str],
    cfg: IndexConfig,
) -> DataFrame:
    """doc_count of docs containing (source ∈ frontier, target ∈ targets),
    from one tokenize pass over the union match set."""
    from .postings import tokenized

    matched = _matched_docids(spark, index_dir, " ".join(frontier + targets), cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [], CONNECTIONS_SCHEMA)
    fwd = tbl.read(spark, index_dir, "forward").select("docid", "text")
    base = IndexConfig(k1=cfg.k1, b=cfg.b)  # plain analyzer
    doc_terms = (
        tokenized(matched.join(fwd, "docid", "inner"), base)
        .filter(F.col("term").isNotNull())
        .select("docid", "term")
    )
    src = doc_terms.filter(F.col("term").isin(frontier)).withColumnRenamed("term", "source")
    dst = doc_terms.filter(F.col("term").isin(targets)).withColumnRenamed("term", "target")
    return (
        src.join(dst, "docid")
        .filter(F.col("source") != F.col("target"))
        .groupBy("source", "target")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


def graph_explore(
    spark: SparkSession,
    index_dir: str,
    seed_query: str,
    depth: int = 1,
    top_vertices: int = 5,
    min_doc_count: int = 3,
    cfg: IndexConfig | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Explore ``depth`` waves out from ``seed_query``.

    Returns (vertices, connections): vertices carry the wave they were
    discovered in (depth 0 = the seed's own significant terms) with
    their JLH significance; connections link a prior-wave source vertex
    to a newly-discovered target with the exact co-occurring doc count.
    """
    if depth < 0 or top_vertices < 1:
        raise ValueError("graph_explore: depth >= 0 and top_vertices >= 1 required")
    cfg = effective_config(spark, index_dir, cfg)
    seen: list[str] = []
    vert_rows: list[tuple] = []
    conn_frames: list[DataFrame] = []
    frontier_query = seed_query
    frontier_terms: list[str] = []
    for d in range(depth + 1):
        sig = significant_terms(
            spark,
            index_dir,
            frontier_query,
            # over-fetch so excluding seen vertices still fills the wave
            size=top_vertices + len(seen),
            min_doc_count=min_doc_count,
            cfg=cfg,
        ).collect()
        wave = [r for r in sig if r["term"] not in seen][:top_vertices]
        if not wave:
            break
        new_terms = [r["term"] for r in wave]
        vert_rows.extend(
            (r["term"], d, int(r["fg_df"]), int(r["bg_df"]), float(r["jlh"]))
            for r in wave
        )
        if frontier_terms:
            conn_frames.append(
                _cooccurrence(spark, index_dir, frontier_terms, new_terms, cfg)
            )
        seen.extend(new_terms)
        frontier_terms = new_terms
        frontier_query = " ".join(new_terms)
    vertices = tbl.local_rows_df(spark, vert_rows, VERTICES_SCHEMA)
    if conn_frames:
        connections = conn_frames[0]
        for f in conn_frames[1:]:
            connections = connections.unionByName(f)
    else:
        connections = tbl.local_rows_df(spark, [], CONNECTIONS_SCHEMA)
    return vertices, connections
