"""Percolate — ES's reverse search: registered queries matched per doc.

The ES percolator stores queries in an index and, given a document,
returns which stored queries it matches (alerting / routing / saved
searches — the reference's sync users percolate incoming rows against
stored watch queries). Here the registered set is a small table of

    (query_id, query text, mode)   mode ∈ {"all", "any"}

"all" = ES bool.must over the query's analyzer terms (every term must be
present); "any" = ES match (at least one term). Matching is term-set
containment — the same contract as the engine's conjunctive/disjunctive
postings paths, evaluated doc-side because percolation inverts the
direction: millions of docs stream past thousands of queries.

Scale shape: one Arrow tokenize pass over the docs → exploded DISTINCT
(doc, term) → inner join against the BROADCAST query-term table (stored
query sets are small by construction; the join never shuffles the doc
side) → map-side-combined count per (doc, query) compared to the
query's required-term count. No per-row Python, no driver loop over
queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analyze import tokenize_text
from ..sources import tables as tbl
from .textstats import with_tokens


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[str, str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, query_id) for every (doc, stored query) match.

    ``queries``: (query_id, query_text, mode) with mode "all" | "any".
    A query whose analyzer yields no terms matches nothing (ES returns
    no percolator hits for an empty query).
    """
    rows = []
    seen_ids: set[str] = set()
    for qid, qtext, mode in queries:
        if mode not in ("all", "any"):
            raise ValueError(f"query {qid!r}: unknown mode {mode!r}")
        if qid in seen_ids:
            raise ValueError(f"duplicate stored query id {qid!r}")
        seen_ids.add(qid)
        terms = list(dict.fromkeys(tokenize_text(qtext)))
        need = len(terms) if mode == "all" else 1
        rows.extend((qid, t, need) for t in terms)
    qterms = tbl.local_rows_df(
        spark, rows, "query_id string, term string, need int"
    )
    # distinct across ROWS too: a non-unique id_col (e.g. conv_id over
    # turns) must count each term once per id, or 'all' mode would accept
    # an id whose rows cover n_terms occurrences of one term
    toks = (
        with_tokens(docs, text_col)
        .select(F.col(id_col), F.explode(F.array_distinct("toks")).alias("term"))
        .distinct()
    )
    return (
        toks.join(F.broadcast(qterms), "term")
        .groupBy(id_col, "query_id")
        .agg(F.count(F.lit(1)).alias("nt"), F.first("need").alias("need"))
        .filter(F.col("nt") >= F.col("need"))
        .select(id_col, "query_id")
    )
