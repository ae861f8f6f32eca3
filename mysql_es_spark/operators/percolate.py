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

    ``queries``: (query_id, query_text, mode) with mode "all" | "any" |
    "phrase". "phrase" is ES's stored match_phrase: the query's analyzed
    tokens must appear CONSECUTIVELY in one of the id's rows (a phrase
    never spans rows; "all"/"any" union terms across an id's rows). A
    query whose analyzer yields no terms matches nothing (ES returns no
    percolator hits for an empty query).

    Phrase evaluation piggybacks on the containment prefilter: only
    (doc, query) pairs whose docs hold ALL the phrase's terms reach the
    adjacency check — a space-delimited substring probe on the doc's
    joined token stream (JVM ``instr``; tokens contain no spaces, so the
    delimiter makes the probe exactly consecutive-token equality).
    """
    rows = []
    phrase_rows: list[tuple[str, str]] = []
    seen_ids: set[str] = set()
    for qid, qtext, mode in queries:
        if mode not in ("all", "any", "phrase"):
            raise ValueError(f"query {qid!r}: unknown mode {mode!r}")
        if qid in seen_ids:
            raise ValueError(f"duplicate stored query id {qid!r}")
        seen_ids.add(qid)
        seq = tokenize_text(qtext)
        terms = list(dict.fromkeys(seq))
        if mode == "phrase":
            if not seq:
                continue
            phrase_rows.append((qid, " " + " ".join(seq) + " "))
            rows.extend((qid, t, len(terms)) for t in terms)
        else:
            need = len(terms) if mode == "all" else 1
            rows.extend((qid, t, need) for t in terms)
    qterms = tbl.local_rows_df(
        spark, rows, "query_id string, term string, need int"
    )
    # distinct across ROWS too: a non-unique id_col (e.g. conv_id over
    # turns) must count each term once per id, or 'all' mode would accept
    # an id whose rows cover n_terms occurrences of one term
    tokked = with_tokens(docs, text_col)
    toks = (
        tokked.select(F.col(id_col), F.explode(F.array_distinct("toks")).alias("term"))
        .distinct()
    )
    base = (
        toks.join(F.broadcast(qterms), "term")
        .groupBy(id_col, "query_id")
        .agg(F.count(F.lit(1)).alias("nt"), F.first("need").alias("need"))
        .filter(F.col("nt") >= F.col("need"))
        .select(id_col, "query_id")
    )
    if not phrase_rows:
        return base
    ph = tbl.local_rows_df(spark, phrase_rows, "query_id string, phrase string")
    docstr = tokked.select(
        F.col(id_col),
        F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" ")).alias("docstr"),
    )
    cand_ph = base.join(F.broadcast(ph), "query_id")
    hits_ph = (
        cand_ph.join(docstr, id_col)
        .filter(F.expr("instr(docstr, phrase) > 0"))
        .select(id_col, "query_id")
        .distinct()
    )
    non_ph = base.join(F.broadcast(ph.select("query_id")), "query_id", "left_anti")
    return non_ph.unionByName(hits_ph)


def percolate_filters(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[str, str]],
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, query_id) for stored FILTER-context queries — the structured
    half of ES percolation (stored bool filters over the doc's fields,
    vs the term-set/phrase text modes of :func:`percolate`).

    ``queries``: (query_id, sql_predicate) over the doc columns. Each
    predicate is validated with the runtime-field purity rules (pure
    per-row, no nondeterminism/subqueries), then ALL queries evaluate in
    ONE projection: an array of CASE-gated query ids per row, exploded —
    one pass over the batch no matter how many stored queries, the same
    broadcast-the-queries shape as the term-set prefilter. Cost is
    O(rows × queries) predicate evaluations inside whole-stage codegen;
    ES evaluates the same product against its percolator index."""
    from ..functions.runtime import _FORBIDDEN, _SUBQUERY

    seen: set[str] = set()
    gated = []
    for qid, pred in queries:
        if qid in seen:
            raise ValueError(f"duplicate stored query id {qid!r}")
        seen.add(qid)
        if not isinstance(pred, str) or not pred.strip():
            raise ValueError(f"query {qid!r}: predicate must be a SQL string")
        if _FORBIDDEN.search(pred) or _SUBQUERY.search(pred):
            raise ValueError(
                f"query {qid!r}: predicates must be pure per-row filters"
            )
        gated.append(F.when(F.expr(pred), F.lit(qid)))
    if not gated:
        return docs.select(F.col(id_col).alias(id_col)).limit(0).withColumn(
            "query_id", F.lit("")
        )
    hits = F.array_compact(F.array(*gated))
    return (
        docs.select(F.col(id_col), F.explode(hits).alias("query_id"))
    )
