"""Multi-field index + ES ``multi_match`` query.

Lucene keeps one inverted index PER FIELD inside a segment — each field
has its own term dictionary, postings and length norms — and ES
``multi_match`` scores the query against several fields and combines the
per-field scores per document (``best_fields`` = dis-max with an optional
``tie_breaker``; ``most_fields`` = sum). The reference syncs every mapped
column of a table into such per-field indexes (etc/template.json declares
several analyzed fields; Writer.java:106-144 bulk docs carry all of them)
and its users query them with multi_match.

Spark-first realization: a field is a full self-describing sub-index under
``root/field=<name>`` built by the ordinary wave builder. Because docids
are a pure function of (conv_id, turn_idx) (operators/docids.py — static
bucket ranges + deterministic in-bucket row_number), every sub-index
assigns the SAME docid to the same row: cross-field combination is an
equi-union on docid with no identity join. Per-field BM25 statistics
(df, avgdl, N) come from the field's own sub-index, exactly like Lucene's
per-field norms/term stats.

Scale: each per-field scoring pass is the standard pruned/disjunctive
postings path (partition-pruned metadata reads, postings-bounded work);
the combine is one hash agg on docid over matched docs only. Nothing is
ever driver-materialized.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..operators.query import (
    _decode_contribs,
    _decode_scores,
    _decode_tf_dl,
    _mask_deleted,
    _matching_blocks,
    corpus_stats,
    deleted_docids,
    effective_config,
    query_terms,
    term_meta,
)
from ..sources import tables as tbl
from .build import build_index

FIELDS_META_SCHEMA = "field string, boost double"


def field_dir(root: str, name: str) -> str:
    return tbl.p(root, f"field={name}")


def build_multi_field(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    fields: dict[str, float],
    cfg: IndexConfig | None = None,
    resume: bool = False,
) -> dict:
    """Build one sub-index per analyzed field (``fields`` maps column name
    → query-time boost). Every sub-index is an ordinary resumable wave
    build over ``df`` with the field's column as the analyzed text; the
    boosts are persisted in a ``fields_meta`` table so queries are
    self-describing (the same contract as index_meta).
    """
    if not fields:
        raise ValueError("fields must name at least one column")
    cfg = cfg or IndexConfig()
    out: dict = {}
    for name in fields:
        fdf = df if name == "text" else df.withColumn("text", F.col(name).cast("string"))
        out[name] = build_index(spark, fdf, field_dir(root, name), cfg, resume=resume)
    tbl.local_rows_df(
        spark, [(n, float(b)) for n, b in fields.items()], FIELDS_META_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(tbl.p(root, "fields_meta"))
    return out


def stored_fields(spark: SparkSession, root: str) -> dict[str, float]:
    rows = spark.read.parquet(tbl.p(root, "fields_meta")).collect()
    return {r["field"]: float(r["boost"]) for r in rows}


def _field_scores(
    spark: SparkSession, ix: str, query: str, cfg: IndexConfig | None
) -> DataFrame | None:
    """All matching docs' disjunctive BM25 scores for ONE field's
    sub-index (no top-k cut: combination needs every field's score for a
    doc, so truncating per field before the combine would be wrong)."""
    cfgx = effective_config(spark, ix, cfg)
    terms = query_terms(query)
    if not terms:
        return None
    stats = corpus_stats(spark, ix)
    idf, buckets = term_meta(spark, ix, terms, stats["n_docs"], cfgx)
    terms = [t for t in terms if t in idf]
    if not terms:
        return None
    blocks = _matching_blocks(spark, ix, terms, buckets)
    return _decode_scores(blocks, idf, cfgx, stats["avgdl"], deleted_docids(spark, ix))


def _field_term_contribs(
    spark: SparkSession, ix: str, query: str, cfg: IndexConfig | None, boost: float
) -> DataFrame | None:
    """Per-(doc, term) boosted BM25 contributions for one field's
    sub-index — the term-granular form cross_fields needs (best/most
    aggregate per field first, cross_fields per term first)."""
    cfgx = effective_config(spark, ix, cfg)
    terms = query_terms(query)
    if not terms:
        return None
    stats = corpus_stats(spark, ix)
    idf, buckets = term_meta(spark, ix, terms, stats["n_docs"], cfgx)
    terms = [t for t in terms if t in idf]
    if not terms:
        return None
    blocks = _matching_blocks(spark, ix, terms, buckets)
    c = _decode_contribs(
        blocks, idf, cfgx, stats["avgdl"], clause_of={t: t for t in terms}
    )
    return _mask_deleted(c, deleted_docids(spark, ix)).select(
        "docid",
        F.col("clause").alias("term"),
        (F.col("contrib") * F.lit(float(boost))).alias("fs"),
    )


def multi_match_topk(
    spark: SparkSession,
    root: str,
    query: str,
    k: int = 10,
    mtype: str = "best_fields",
    tie_breaker: float = 0.0,
    fields: dict[str, float] | None = None,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``multi_match`` over a multi-field index.

    ``best_fields``: score = max(field scores) + tie_breaker · (sum − max)
    (ES dis_max; tie_breaker=1.0 degenerates to most_fields).
    ``most_fields``: score = sum(field scores). Each field score is the
    field's own-statistics BM25 disjunctive score times its boost.
    ``cross_fields``: term-centric — fields act as one logical field: for
    each query TERM the per-field boosted contributions dis-max (max +
    tie_breaker · rest), then terms sum per doc (ES's blended-term
    behavior: a doc matching "alice" in author and "smith" in title beats
    one matching both words in a single field under best_fields).
    Returns (docid, score) in (score desc, docid asc) order, limit k.
    """
    if mtype not in ("best_fields", "most_fields", "cross_fields"):
        raise ValueError(f"unknown multi_match type {mtype!r}")
    fields = fields or stored_fields(spark, root)
    empty = tbl.local_rows_df(spark, [], "docid long, score double")
    tie = F.lit(float(tie_breaker))

    if mtype == "cross_fields":
        per = []
        for name, boost in fields.items():
            c = _field_term_contribs(spark, field_dir(root, name), query, cfg, boost)
            if c is not None:
                per.append(c)
        if not per:
            return empty
        u = reduce(DataFrame.unionByName, per)
        per_term = u.groupBy("docid", "term").agg(
            F.max("fs").alias("mx"), F.sum("fs").alias("sm")
        )
        scored = per_term.groupBy("docid").agg(
            F.sum(F.col("mx") + tie * (F.col("sm") - F.col("mx"))).alias("score")
        )
        return scored.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)

    per = []
    for name, boost in fields.items():
        s = _field_scores(spark, field_dir(root, name), query, cfg)
        if s is not None:
            per.append(s.select("docid", (F.col("score") * F.lit(float(boost))).alias("fs")))
    if not per:
        return empty
    u = reduce(DataFrame.unionByName, per)
    agg = u.groupBy("docid").agg(F.max("fs").alias("mx"), F.sum("fs").alias("sm"))
    if mtype == "most_fields":
        score = F.col("sm")
    else:
        score = F.col("mx") + tie * (F.col("sm") - F.col("mx"))
    return (
        agg.select("docid", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )


def combined_fields_topk(
    spark: SparkSession,
    root: str,
    query: str,
    k: int = 10,
    fields: dict[str, float] | None = None,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``combined_fields`` (7.13+, the principled successor to
    cross_fields): the fields are scored as ONE synthetic combined field —
    simple BM25F with per-field weights folded into term frequency and
    length:

        tf_c(t,d)  = Σ_f w_f · tf(t, f, d)
        dl_c(d)    = Σ_f w_f · len(f, d)
        df_c(t)    = |{d : t appears in ANY field of d}|
        score(d)   = Σ_t idf(df_c) · tf_c / (tf_c + k1·(1−b+b·dl_c/avgdl_c))

    Unlike cross_fields (per-term dis-max of per-field scores with each
    field's own statistics), combined_fields is term-centric over ONE
    statistics space, so scores are comparable across docs regardless of
    which field matched.

    Scale shape: dl_c is one hash agg over the sub-indexes' doc_lens
    tables (docid+int rows — the smallest tables in the layout); the
    per-field decodes are the standard pruned postings passes; the
    combine is two hash aggs on (docid, term) then docid. Driver-side:
    N/avgdl (two scalars) and per-term df (≤ |query| rows) only."""
    fields = fields or stored_fields(spark, root)
    terms = query_terms(query)
    empty = tbl.local_rows_df(spark, [], "docid long, score double")
    if not terms or not fields:
        return empty
    names = list(fields)
    cfg0 = effective_config(spark, field_dir(root, names[0]), cfg)

    lens = reduce(
        DataFrame.unionByName,
        [
            tbl.read(spark, field_dir(root, n), "doc_lens").select(
                "docid", (F.col("dl") * F.lit(float(w))).alias("wdl")
            )
            for n, w in fields.items()
        ],
    )
    dlc = lens.groupBy("docid").agg(F.sum("wdl").alias("dlc")).persist()
    try:
        row = dlc.agg(
            F.count(F.lit(1)).alias("n"), F.avg("dlc").alias("avgdl")
        ).collect()[0]
        n_docs, avgdl_c = int(row["n"]), float(row["avgdl"] or 0.0)
        if n_docs == 0:
            return empty

        per, dels = [], []
        for name, w in fields.items():
            ix = field_dir(root, name)
            cfgx = effective_config(spark, ix, cfg)
            stats = corpus_stats(spark, ix)
            idf, buckets = term_meta(spark, ix, terms, stats["n_docs"], cfgx)
            ts = [t for t in terms if t in idf]
            d = deleted_docids(spark, ix)
            if d is not None:
                dels.append(d)
            if not ts:
                continue
            blocks = _matching_blocks(spark, ix, ts, buckets)
            per.append(
                _decode_tf_dl(blocks).select(
                    "docid", "term", (F.col("tf") * F.lit(float(w))).alias("wtf")
                )
            )
        if not per:
            return empty
        u = reduce(DataFrame.unionByName, per)
        tfc = u.groupBy("docid", "term").agg(F.sum("wtf").alias("tfc"))
        if dels:
            tfc = _mask_deleted(tfc, reduce(DataFrame.unionByName, dels).distinct())
        tfc = tfc.persist()
        try:
            df_rows = tfc.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
            if not df_rows:
                return empty
            import numpy as np

            idf_c = {
                r["term"]: float(
                    np.log(1.0 + (n_docs - int(r["df"]) + 0.5) / (int(r["df"]) + 0.5))
                )
                for r in df_rows
            }
            idf_col = F.element_at(
                F.create_map(*[x for t, v in idf_c.items() for x in (F.lit(t), F.lit(v))]),
                F.col("term"),
            )
            k1, b = F.lit(cfg0.k1), F.lit(cfg0.b)
            contrib = idf_col * F.col("tfc") / (
                F.col("tfc") + k1 * (F.lit(1.0) - b + b * F.col("dlc") / F.lit(avgdl_c))
            )
            out = (
                tfc.join(dlc, "docid")
                .select("docid", contrib.alias("c"))
                .groupBy("docid")
                .agg(F.sum("c").alias("score"))
                .orderBy(F.col("score").desc(), F.col("docid").asc())
                .limit(k)
            )
            return out.localCheckpoint(eager=True)
        finally:
            tfc.unpersist()
    finally:
        dlc.unpersist()
