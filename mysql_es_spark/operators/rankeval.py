"""ES ``_rank_eval`` — ranked-retrieval quality metrics over a batch of
labeled queries.

Given requests ``{qid: (query_string, {external_doc_id: relevance})}``,
run the whole batch as ONE distributed search plan (:func:`bm25_topk_multi`
— the union of all queries' postings decoded once), then score each
query's ranking against its relevance judgements:

- ``precision_k``  relevant retrieved / retrieved (ES ``precision``)
- ``recall_k``     relevant retrieved / total relevant (ES ``recall``);
  null when the query has no relevant judgement at all
- ``mrr``          1/rank of the first relevant hit (ES
  ``mean_reciprocal_rank``), 0 when nothing relevant is retrieved
- ``ndcg``         DCG@k / ideal-DCG@k with the ES
  ``discounted_cumulative_gain`` gain function (2^rel − 1)/log2(rank+1);
  null when no positive judgement exists (ideal DCG is 0)

Everything after the search is a handful of hash aggregations over ≤ k
rows per query plus one window over the (tiny, but per-qid partitioned —
never global) judgement set for the ideal DCG, so the evaluation itself
adds no measurable cost to the batch search and scales with the number
of queries, not the corpus.

Ranks are computed on the EXTERNAL id space with rounded scores
(``order_round``), matching how a cross-engine oracle sees the ranking:
the engine's internal docids are bucket-ordered and would tie-break
equal scores differently.

Reference context: the reference serves ES search DSL verbatim over its
indexes (Es.java passthrough); _rank_eval is the stock API for
regression-testing ranking quality on such an index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..sources import tables as tbl
from .query import bm25_topk_multi, effective_config

OUT_SCHEMA = (
    "qid string, retrieved int, precision_k double, recall_k double, "
    "mrr double, ndcg double"
)


def rank_eval(
    spark: SparkSession,
    index_dir: str,
    requests: dict[str, tuple[str, dict[int, int]]],
    k: int = 10,
    cfg: IndexConfig | None = None,
    key: str = "conv_id",
    order_round: int = 4,
) -> DataFrame:
    """One row per request qid with the metrics above. ``key`` names the
    forward-table column holding the external document id the relevance
    judgements use. Negative relevance values are rejected (the gain
    function 2^rel − 1 would go negative); rel 0 means judged
    non-relevant, same as unjudged."""
    if k < 1:
        raise ValueError(f"rank_eval: k must be >= 1, got {k}")
    for qid, (_q, ratings) in requests.items():
        if any(r < 0 for r in ratings.values()):
            raise ValueError(f"rank_eval: negative relevance for qid {qid!r}")
    cfg = effective_config(spark, index_dir, cfg)
    qids = tbl.local_rows_df(spark, [(str(q),) for q in requests], "qid string")
    if not requests:
        return tbl.local_rows_df(spark, [], OUT_SCHEMA)

    ranked = bm25_topk_multi(
        spark,
        index_dir,
        {qid: q for qid, (q, _r) in requests.items()},
        k=k,
        cfg=cfg,
        order_round=order_round,
    )
    fwd = spark.read.parquet(tbl.p(index_dir, "forward")).select(
        "docid", F.col(key).cast("long").alias("ext_id")
    )
    # re-rank on the external id: equal rounded scores must tie-break in
    # the id space the judgements (and any oracle) live in
    w = Window.partitionBy("qid").orderBy(
        F.round("score", order_round).desc(), F.col("ext_id").asc()
    )
    hits = (
        ranked.join(fwd, "docid")
        .select("qid", "ext_id", "score")
        .withColumn("rank", F.row_number().over(w))
    )

    ratings_rows = [
        (str(qid), int(doc), int(rel))
        for qid, (_q, ratings) in requests.items()
        for doc, rel in ratings.items()
    ]
    rat = F.broadcast(
        tbl.local_rows_df(spark, ratings_rows, "qid string, ext_id long, rel int")
    )

    gain = (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)) / F.log2(F.col("rank") + 1)
    per_q = (
        hits.join(rat, ["qid", "ext_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .groupBy("qid")
        .agg(
            F.count("*").alias("retrieved"),
            F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("rel_retrieved"),
            F.max(
                F.when(F.col("rel") > 0, F.lit(1.0) / F.col("rank")).otherwise(0.0)
            ).alias("mrr"),
            F.sum(gain).alias("dcg"),
        )
    )
    # ideal DCG: the judged relevances sorted descending, capped at k —
    # windowed per qid (partitioned, scale-safe), never a global sort
    iw = Window.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("ext_id").asc())
    ideal = (
        rat.filter(F.col("rel") > 0)
        .withColumn("rank", F.row_number().over(iw))
        .filter(F.col("rank") <= k)
        .groupBy("qid")
        .agg(F.sum(gain).alias("idcg"))
    )
    totals = (
        rat.groupBy("qid")
        .agg(F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("total_rel"))
    )
    return (
        qids.join(per_q, "qid", "left")
        .join(ideal, "qid", "left")
        .join(totals, "qid", "left")
        .select(
            "qid",
            F.coalesce("retrieved", F.lit(0)).cast("int").alias("retrieved"),
            F.when(
                F.coalesce("retrieved", F.lit(0)) > 0,
                F.coalesce("rel_retrieved", F.lit(0))
                / F.col("retrieved").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("precision_k"),
            F.when(
                F.coalesce("total_rel", F.lit(0)) > 0,
                F.coalesce("rel_retrieved", F.lit(0))
                / F.col("total_rel").cast("double"),
            ).alias("recall_k"),
            F.coalesce("mrr", F.lit(0.0)).alias("mrr"),
            F.when(
                F.col("idcg").isNotNull(),
                F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"),
            ).alias("ndcg"),
        )
    )


def mine_hard_negatives(
    spark: SparkSession,
    index_dir: str,
    requests: dict[str, tuple[str, set | dict]],
    k: int = 20,
    skip_top: int = 0,
    per_query: int | None = None,
    cfg: IndexConfig | None = None,
    key: str = "conv_id",
    order_round: int = 4,
) -> DataFrame:
    """BM25 hard-negative mining — the training-data half of _rank_eval:
    for each labeled query ``qid -> (query_string, positive_ext_ids)``,
    the top-k retrieved docs that are NOT judged positives, i.e. the
    lexically-confusable negatives a dense retriever / reranker trains
    against. ``skip_top`` drops the highest-ranked survivors (common
    false-negative guard), ``per_query`` caps the emitted negatives.

    One distributed plan for the whole batch (:func:`bm25_topk_multi`
    decodes the union of all queries' postings once); positives leave by
    an anti-join on (qid, ext_id); ranks live in the external-id space
    with rounded scores, matching rank_eval and any cross-engine oracle.
    Returns (qid, ext_id, score, neg_rank) with neg_rank 1.. per qid.
    """
    if k < 1:
        raise ValueError(f"mine_hard_negatives: k must be >= 1, got {k}")
    cfg = effective_config(spark, index_dir, cfg)
    out_schema = "qid string, ext_id long, score double, neg_rank int"
    if not requests:
        return tbl.local_rows_df(spark, [], out_schema)
    ranked = bm25_topk_multi(
        spark,
        index_dir,
        {qid: q for qid, (q, _pos) in requests.items()},
        k=k,
        cfg=cfg,
        order_round=order_round,
    )
    fwd = spark.read.parquet(tbl.p(index_dir, "forward")).select(
        "docid", F.col(key).cast("long").alias("ext_id")
    )
    pos_rows = [
        (str(qid), int(p))
        for qid, (_q, pos) in requests.items()
        for p in (pos or ())
    ]
    hits = ranked.join(fwd, "docid").select("qid", "ext_id", "score")
    if pos_rows:
        positives = tbl.local_rows_df(spark, pos_rows, "qid string, ext_id long")
        hits = hits.join(positives, ["qid", "ext_id"], "left_anti")
    w = Window.partitionBy("qid").orderBy(
        F.round("score", order_round).desc(), F.col("ext_id").asc()
    )
    out = (
        hits.withColumn("neg_rank", (F.row_number().over(w) - skip_top).cast("int"))
        .filter(F.col("neg_rank") >= 1)
    )
    if per_query is not None:
        out = out.filter(F.col("neg_rank") <= int(per_query))
    return out.select("qid", "ext_id", "score", "neg_rank")


def ltr_features(
    spark: SparkSession,
    index_dir: str,
    requests: dict[str, tuple[str, dict[int, float]]],
    cfg: IndexConfig | None = None,
    key: str = "conv_id",
    field_features: dict[str, str] | None = None,
) -> DataFrame:
    """ES learning-to-rank feature logging (the 8.12 _ltr contract): for
    every labeled (query, document) pair, extract the feature vector a
    reranker trains on — in ONE batch plan over the index.

    ``requests``: qid → (query_string, {external_doc_id: label}).
    ``field_features``: extra per-document features as SQL expressions
    over the forward columns (validated pure, the runtime-fields rule).

    Features logged per pair:
    - ``bm25``           full-query BM25 score (0.0 when the doc matches
                         no query term — ES logs 0 for a non-matching
                         feature query, not null)
    - ``matched_terms``  distinct query terms present in the doc
    - ``query_len``      analyzed terms in the query
    - ``dl``             document length (tokens)
    - one column per ``field_features`` entry (null when the doc id is
      not in the index — unknown docs have no doc values)

    Plan: the union of all queries' postings decodes ONCE
    (bm25_topk_multi with k=None — no rank window, the full scored match
    sets), then two broadcast-sized joins attach judgments and query
    lengths; doc-level features ride one forward/doc_lens lookup keyed
    by the judged ids. Cost scales with the term union + judged pairs,
    never pairs × corpus."""
    from .query import query_terms

    cfg = effective_config(spark, index_dir, cfg)
    pairs = [
        (str(qid), int(doc), float(lbl))
        for qid, (_q, labels) in requests.items()
        for doc, lbl in labels.items()
    ]
    feat_names = list(field_features or {})
    out_schema = (
        "qid string, ext_id long, label double, bm25 double, "
        "matched_terms long, query_len long, dl long"
    )
    if not pairs:
        return tbl.local_rows_df(spark, [], out_schema)
    # jd sits on the LEFT of the outer join below, where a broadcast hint
    # cannot apply (the preserved side can't be the build side); it is
    # broadcast where legal — the judged-ids semi-join
    jd = tbl.local_rows_df(spark, pairs, "qid string, ext_id long, label double")
    qlen = F.broadcast(
        tbl.local_rows_df(
            spark,
            [(str(qid), len(query_terms(q))) for qid, (q, _l) in requests.items()],
            "qid string, query_len long",
        )
    )

    fwd = spark.read.parquet(tbl.p(index_dir, "forward"))
    if field_features:
        from ..functions.runtime import compile_runtime_fields

        fwd = compile_runtime_fields(fwd, field_features)
    ids = fwd.select("docid", F.col(key).cast("long").alias("ext_id"), *feat_names)

    scored = bm25_topk_multi(
        spark, index_dir, {qid: q for qid, (q, _l) in requests.items()}, k=None, cfg=cfg
    ).join(ids.select("docid", "ext_id"), "docid")

    dls = spark.read.parquet(tbl.p(index_dir, "doc_lens")).select("docid", "dl")
    doc_side = (
        ids.join(dls, "docid", "left")
        .join(F.broadcast(jd.select("ext_id").distinct()), "ext_id", "left_semi")
        .drop("docid")
    )

    return (
        jd.join(scored.select("qid", "ext_id", "score", "matched_terms"), ["qid", "ext_id"], "left")
        .join(doc_side, "ext_id", "left")
        .join(qlen, "qid", "left")
        .select(
            "qid",
            "ext_id",
            "label",
            F.coalesce(F.col("score"), F.lit(0.0)).alias("bm25"),
            F.coalesce(F.col("matched_terms"), F.lit(0)).cast("long").alias("matched_terms"),
            F.col("query_len"),
            F.col("dl"),
            *feat_names,
        )
    )
