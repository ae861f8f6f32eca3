"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship path: full inverted-index build + BM25
top-k over the sf0.001 documents table. ``queries()`` exposes every
implemented operator from SURVEY.md §2 plus the training-data-pipeline
suite; ``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible one (the rest get the driver's rows-only check).

Column names/types are aligned on both sides; floating outputs are rounded
to fixed decimals on both sides and orderings use the rounded value so the
k-boundary picks identical rows.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.operators import aggs as esaggs
from mysql_es_spark.operators import dedup, multimodal, packing, sampling, similarity, textstats
from mysql_es_spark.operators.asof import asof_join
from mysql_es_spark.operators.query import (
    bm25_bool_topk,
    bm25_filtered_topk,
    bm25_topk,
    bm25_topk_conjunctive,
    constant_score_topk,
    direct_bm25,
    dis_max_topk,
    distance_feature_topk,
    rank_feature_topk,
    fuzzy_topk,
    ids_topk,
    match_aggregate,
    match_bool_prefix_topk,
    more_like_this_topk,
    phrase_topk,
    pinned_topk,
    prefix_topk,
    simple_query_string_topk,
    span_first_topk,
    terms_set_topk,
    wildcard_topk,
)
from mysql_es_spark.operators.relations import propagate_parent_update
from mysql_es_spark.plans.build import build_index

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

TOK = "regexp_extract_all(lower(strip_accents(text)), '[0-9a-z]+')"
BM25_Q1 = ["spark", "join", "query"]
BM25_Q2 = ["window", "agg", "batch", "scan"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _docs_index_cfg(positions: bool = False, ngram: bool = False) -> IndexConfig:
    return IndexConfig(
        n_buckets=4, wave_size=4, salt_docs=1 << 20, term_buckets=8,
        with_positions=positions, edge_ngram=ngram,
    )


def _documents_as_transcripts(docs: DataFrame) -> DataFrame:
    # lang/source ride along as role/tool so the index's forward table has
    # real per-doc metadata for filter-context search and facet aggs
    return docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.col("lang").alias("role"),
        F.col("text"),
        F.col("source").alias("tool"),
        # deterministic day spread (doc_id % 10 days from 2026-01-01, the
        # same convention as the date-routed variant) so date_histogram
        # aggs over the main index have real calendar buckets
        F.date_add(F.lit("2026-01-01").cast("date"), (F.col("doc_id") % 10).cast("int"))
        .cast("timestamp")
        .alias("ts"),
    )


def _ixcache_dir(sf_dir: str, variant: str) -> tuple[str, str]:
    """Cache dir + completion marker for an index over this sf_dir's
    documents. The key covers the source file's identity (path + size +
    mtime), so regenerated testdata never hits a stale cached index."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    # v3: forward ts is day-spread (doc_id % 10) for date_histogram aggs —
    # older cached indexes (constant ts) must not satisfy them
    ident = f"v3:{os.path.abspath(sf_dir)}:{st.st_size}:{st.st_mtime_ns}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16] + variant
    ix = f"/tmp/mysql_es_spark_ixcache/{key}"
    return ix, os.path.join(ix, "_COMPLETE")


def _index_for_documents(
    spark: SparkSession, sf_dir: str, positions: bool = False, ngram: bool = False
) -> str:
    """Build (once per sf_dir per machine) a full index over documents."""
    variant = ("-pos" if positions else "") + ("-ng" if ngram else "")
    ix, marker = _ixcache_dir(sf_dir, variant)
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(ix, ignore_errors=True)
        docs = _documents_as_transcripts(_t(spark, sf_dir, "documents"))
        build_index(spark, docs, ix, _docs_index_cfg(positions, ngram))
        with open(marker, "w") as f:
            f.write("ok")
    return ix


def _compacted_index_for_documents(spark: SparkSession, sf_dir: str) -> str:
    """Segment-merge the (multi-wave) documents index into one optimized
    wave; queries over it must match the same oracle as the source."""
    from mysql_es_spark.plans.compact import compact_index

    src = _index_for_documents(spark, sf_dir)
    dst, marker = _ixcache_dir(sf_dir, "-compact")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(dst, ignore_errors=True)
        compact_index(spark, src, dst)
        with open(marker, "w") as f:
            f.write("ok")
    return dst


MF_BOOSTS = {"text": 1.0, "tool": 2.0}  # tool column carries `source`


def _multi_field_index_for_documents(spark: SparkSession, sf_dir: str) -> str:
    """Per-field sub-indexes (Lucene: one inverted index per field) over
    documents: `text` plus `source` (riding in the tool column), with
    persisted query-time boosts."""
    from mysql_es_spark.plans.multi_field import build_multi_field

    root, marker = _ixcache_dir(sf_dir, "-mf")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        docs = _documents_as_transcripts(_t(spark, sf_dir, "documents"))
        build_multi_field(spark, docs, root, MF_BOOSTS, _docs_index_cfg())
        with open(marker, "w") as f:
            f.write("ok")
    return root


ROUTED_CFG = IndexConfig(n_buckets=2, wave_size=2, salt_docs=1 << 20, term_buckets=4)


def _routed_index_for_documents(spark: SparkSession, sf_dir: str) -> str:
    """Date-routed layout (W3): documents dated by a deterministic
    synthetic timestamp (doc_id % 10 days from 2026-01-01 — the testdata
    documents table has no ts column), one sub-index per day."""
    from mysql_es_spark.plans.date_routed import build_date_routed

    root, marker = _ixcache_dir(sf_dir, "-routed")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        docs = _documents_as_transcripts(_t(spark, sf_dir, "documents")).withColumn(
            "ts",
            F.expr(
                "CAST(date_add(DATE'2026-01-01', CAST(CAST(conv_id AS LONG) % 10 AS INT)) AS TIMESTAMP)"
            ),
        )
        build_date_routed(spark, docs, root, ROUTED_CFG)
        with open(marker, "w") as f:
            f.write("ok")
    return root


def _bm25_conj_sql(terms: list[str], k: int) -> str:
    """Conjunctive (AND) BM25: docs matching every term; same scoring."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ({tl})
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s,
         count(*) AS nt
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores WHERE nt = {len(terms)}
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT {k}
"""


def _bm25_sql(terms: list[str], k: int) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ({tl})
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Full engine end-to-end on sf0.001: build the inverted index over the
    documents table (bucket waves, lineage, posting blocks), then answer a
    BM25 top-k query with block-max pruning."""
    sf_dir = "/root/testdata/sf0.001"
    ix = _index_for_documents(spark, sf_dir)
    return bm25_topk(
        spark, ix, " ".join(BM25_Q1), k=20, cfg=_docs_index_cfg(), mode="pruned", with_keys=True
    )


# ---------------------------------------------------------------------------
# queries (spark side)
# ---------------------------------------------------------------------------


def q_p1(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.filter(F.col("l_shipdate") < "1996-01-01").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


def q_p4(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_id", "event_type", "user_id"
    )


def q_p6(spark, sf):
    o = _t(spark, sf, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000)
    ).select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))


def q_p8(spark, sf):
    ev = _t(spark, sf, "events")
    masked = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    return ev.select("event_id", "event_type", F.round(masked, 2).alias("value_masked"))


def q_j3(spark, sf):
    o, c = _t(spark, sf, "orders"), _t(spark, sf, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "c_name", "c_mktsegment"
    )


def q_j4(spark, sf):
    o, c = _t(spark, sf, "orders"), _t(spark, sf, "customer")
    n, r = _t(spark, sf, "nation"), _t(spark, sf, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select("o_orderkey", "c_name", "n_name", "r_name")
    )


def q_j1(spark, sf):
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey", "c_name")


def q_janti(spark, sf):
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


def q_j6(spark, sf):
    o, c = _t(spark, sf, "orders"), _t(spark, sf, "customer")
    changed = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("o_custkey"),
        F.lit("URGENT-SYNC").alias("o_orderpriority"),
    )
    return propagate_parent_update(o, changed, "o_custkey", ["o_orderpriority"]).select(
        "o_orderkey", "o_orderpriority"
    )


WITHS_RELATIONS = {
    "orders": {
        "cust": {
            "table": "customer", "local": "o_custkey", "foreign": "c_custkey",
            "columns": ["c_name", "c_mktsegment"],
            "column_alias": {"c_name": "name", "c_mktsegment": "segment"},
        }
    },
    "customer": {
        "nation": {
            "table": "nation", "local": "c_nationkey", "foreign": "n_nationkey",
            "columns": ["n_name"], "column_alias": {"n_name": "name"},
        }
    },
    "nation": {
        "region": {
            "table": "region", "local": "n_regionkey", "foreign": "r_regionkey",
            "columns": ["r_name"], "column_alias": {"r_name": "name"},
        }
    },
}


def q_withs_3hop(spark, sf):
    """Config-driven relation planner (the reference's relations/withs,
    River.java:184-228): orders ⟕ customer ⟕ nation ⟕ region declared as a
    dict, compiled to chained broadcast left joins. The customer dim is
    filtered so the chain has genuine misses → null-padded rows."""
    from mysql_es_spark.operators.relations import apply_withs

    o = _t(spark, sf, "orders")
    tables = {
        "customer": _t(spark, sf, "customer").filter(F.col("c_custkey") < 1000),
        "nation": _t(spark, sf, "nation"),
        "region": _t(spark, sf, "region"),
    }
    return apply_withs(
        o, "orders", ["cust", "cust.nation", "cust.nation.region"],
        WITHS_RELATIONS, tables,
    ).select(
        "o_orderkey", "cust_name", "cust_segment",
        F.col("cust_nation_name").alias("nation_name"),
        F.col("cust_nation_region_name").alias("region_name"),
    )


def q_p3(spark, sf):
    """P3 column rename — the reference declared column_alias but left it
    TODO (River.java:470-471, Emiter.java:248-256); here it's one call."""
    c = _t(spark, sf, "customer")
    return c.select("c_custkey", "c_name", "c_mktsegment").withColumnsRenamed(
        {"c_custkey": "id", "c_name": "name", "c_mktsegment": "segment"}
    )


def q_e1(spark, sf):
    c, s = _t(spark, sf, "customer"), _t(spark, sf, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


def q_e3(spark, sf):
    o, ev = _t(spark, sf, "orders"), _t(spark, sf, "events")
    return o.select(F.col("o_custkey").alias("custkey")).subtract(
        ev.select(F.col("user_id").alias("custkey"))
    )


def q_event_seq(spark, sf):
    """Ordered per-user reassembly — the reference's Record.mix() doc
    flatten (Record.java:263-289) re-expressed for event streams: one
    row per user with the time-ordered event-type sequence. collect_list
    + array_sort on a (ts, event_id) struct keeps the op a single
    hash-aggregate (no window, no second shuffle)."""
    ev = _t(spark, sf, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
            ),
            lambda x: x["event_type"],
        ),
        " ",
    )
    return ev.groupBy("user_id").agg(seq.alias("event_seq"))


def q_a1(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


def q_a3(spark, sf):
    return _t(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


def q_tpch_q1(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_a2(spark, sf):
    ev = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run_start = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("rs", run_start)
        .groupBy("user_id")
        .agg(F.sum("rs").alias("n_runs"), F.count(F.lit(1)).alias("n_events"))
    )


def q_w1(spark, sf):
    ev = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q_running(spark, sf):
    o = _t(spark, sf, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey", "o_custkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total")
    )


def q_eql_sequence(spark, sf):
    """EQL sequence query (ES Event Query Language): per user, chains
    view → click → purchase within 48 h, expelled by an intervening
    'error' (until). One shuffle total: every window pass shares the
    (user_id) partitioning. start_ts is the latest-possible chain start
    (minimal span), which makes maxspan an exact existence test."""
    from mysql_es_spark.operators.eql import sequence_matches

    ev = _t(spark, sf, "events")
    out = sequence_matches(
        ev,
        "user_id",
        ["event_type = 'view'", "event_type = 'click'", "event_type = 'purchase'"],
        tiebreak="event_id",
        maxspan_seconds=172800,
        until="event_type = 'error'",
    )
    return out.select("user_id", "start_ts", "end_ts", "end_event_id").orderBy(
        "user_id", "end_event_id"
    )


def q_esql_match(spark, sf):
    """ES|QL full-text match() against the built index: the WHERE's
    match() conjunct compiles to a postings match-set semi-join
    (presence-only decode, partition-pruned), the scalar conjunct stays
    a pushed-down filter, and the rest of the pipe is ordinary ES|QL."""
    from mysql_es_spark.functions.esql import esql_search

    ix = _index_for_documents(spark, sf)
    return esql_search(
        """FROM docs
           | WHERE match(text, "spark join") AND role == "en"
           | EVAL doc_id = CAST(conv_id AS BIGINT), tlen = CAST(length(text) AS BIGINT)
           | KEEP doc_id, role, tool, tlen
           | SORT doc_id""",
        spark,
        {"docs": ix},
        cfg=_docs_index_cfg(),
    )


def q_events_downsample(spark, sf):
    """ES _downsample: events rolled to one row per (event_type, day)
    storing min/max/sum/value_count of the value metric — the closed
    algebra that answers any coarser date_histogram later."""
    import tempfile

    from mysql_es_spark.plans.downsample import downsample, read_downsampled

    dest = tempfile.mkdtemp(prefix="downsample_gate_")
    downsample(
        spark, _t(spark, sf, "events"), dest, "1 day", ["event_type"], ["value"]
    )
    out = read_downsampled(spark, dest)
    return out.select(
        "event_type",
        F.col("ts_bucket").alias("day_ts"),
        F.round("value_min", 4).alias("v_min"),
        F.round("value_max", 4).alias("v_max"),
        F.round("value_sum", 4).alias("v_sum"),
        F.col("value_value_count").cast("long").alias("v_count"),
    ).orderBy("event_type", "day_ts")


def q_bm25_query_rules(spark, sf):
    """ES _query_rules (rule retriever): a contains-criterion pins docs
    42 and 7 ahead of the organic Q1 ranking (deterministic 1e6-i
    scores) and an always-rule excludes doc 3; a non-matching rule's
    pins stay inert. Criteria evaluate on request metadata driver-side;
    the search is one pinned-query plan + an isin anti-filter."""
    from mysql_es_spark.operators.rules import rules_topk

    ix = _index_for_documents(spark, sf)
    rules = [
        {
            "type": "pinned",
            "ids": ["42:0", "7:0"],
            "criteria": [
                {"type": "contains", "metadata": "user_query", "values": ["spark"]}
            ],
        },
        {"type": "exclude", "ids": ["3:0"], "criteria": [{"type": "always"}]},
        {
            "type": "pinned",
            "ids": ["999999:0"],
            "criteria": [
                {"type": "exact", "metadata": "user_query", "values": ["zzz"]}
            ],
        },
    ]
    top = rules_topk(
        spark, ix, " ".join(BM25_Q1), rules, k=20, cfg=_docs_index_cfg(), with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def q_graph_explore(spark, sf):
    """ES Graph _explore (depth 1): the seed query's significant terms
    (wave 0), then the significant terms of THOSE terms' match set with
    wave-0 vertices excluded (wave 1) — two significant_terms plans, each
    query-proportional; vertex lists never exceed top_vertices rows."""
    from mysql_es_spark.operators.graph import graph_explore

    ix = _index_for_documents(spark, sf)
    verts, _conns = graph_explore(
        spark, ix, " ".join(BM25_Q1), depth=1, top_vertices=4,
        min_doc_count=3, cfg=_docs_index_cfg(),
    )
    return verts.select(
        "term", "depth", "fg_df", "bg_df", F.round("jlh", 6).alias("jlh")
    ).orderBy("depth", "term")


LTR_JUDGED = {
    "q1": (" ".join(BM25_Q1), {3: 2.0, 57: 0.0, 123: 1.0, 321: 1.0, 999999999: 0.0}),
    "q2": (" ".join(BM25_Q2), {8: 1.0, 241: 2.0}),
}


def q_ltr_features(spark, sf):
    """ES learning-to-rank feature logging: per labeled (query, doc)
    pair, the feature vector (bm25 / matched_terms / query_len / dl) in
    one batch plan — postings for the union of all queries decoded once,
    judgments joined broadcast-side. Unknown docs log bm25=0, null dl."""
    from mysql_es_spark.operators.rankeval import ltr_features

    ix = _index_for_documents(spark, sf)
    out = ltr_features(spark, ix, LTR_JUDGED, key="conv_id", cfg=_docs_index_cfg())
    return out.select(
        "qid",
        "ext_id",
        "label",
        F.round("bm25", 4).alias("bm25"),
        "matched_terms",
        "query_len",
        F.col("dl").cast("long").alias("dl"),
    ).orderBy("qid", "ext_id")


def q_esql_lookup_stats(spark, sf):
    """ES|QL 8.18 surface: LOOKUP JOIN (broadcast left join against a
    lookup table, duplicate keys multiply) + per-aggregate STATS WHERE
    filters compiled into one hash aggregate."""
    from mysql_es_spark.functions.esql import esql

    docs = _t(spark, sf, "documents")
    lk = docs.groupBy("lang").agg(F.avg("n_chars").alias("lang_avg"))
    return esql(
        """FROM documents
           | LOOKUP JOIN lang_stats ON lang
           | STATS n_above = COUNT(*) WHERE n_chars > lang_avg,
                   total = COUNT(*)
             BY lang, source
           | SORT lang, source""",
        {"documents": docs, "lang_stats": lk},
    )


def q_esql_fork(spark, sf):
    """ES|QL 8.19 FORK: two branch sub-pipes over the same filtered
    input, unioned with the _fork discriminator (schemas null-pad)."""
    from mysql_es_spark.functions.esql import esql

    return esql(
        """FROM documents
           | FORK (WHERE lang == "en" | STATS n = COUNT(*), widest = MAX(n_chars))
                  (STATS n = COUNT(*), widest = MAX(n_chars) BY source
                   | SORT source | LIMIT 3)
           | SORT _fork, source""",
        {"documents": _t(spark, sf, "documents")},
    )


def q_esql_inlinestats(spark, sf):
    """ES|QL INLINESTATS: per-group aggregate attached WITHOUT collapsing
    (window aggregate, one shuffle) — here selecting each language's
    longest documents."""
    from mysql_es_spark.functions.esql import esql

    return esql(
        """FROM documents
           | INLINESTATS mx = MAX(n_chars) BY lang
           | WHERE n_chars == mx
           | KEEP lang, doc_id, n_chars
           | SORT lang, doc_id""",
        {"documents": _t(spark, sf, "documents")},
    )


def q_esql_score(spark, sf):
    """ES|QL METADATA _score: relevance-scored full-text match() — the
    pipe's _score column is the clause's BM25 sum, rank- and score-
    identical to bm25_topk (oracle: the same independent SQL BM25 as
    bm25_direct)."""
    from mysql_es_spark.functions.esql import esql_search

    ix = _index_for_documents(spark, sf)
    return esql_search(
        """FROM docs METADATA _score
           | WHERE match(text, "spark join query")
           | EVAL doc_id = CAST(conv_id AS BIGINT), score = round(_score, 4)
           | KEEP doc_id, score
           | SORT score DESC, doc_id
           | LIMIT 20""",
        spark,
        {"docs": ix},
        cfg=_docs_index_cfg(),
    )


def q_transform_pivot(spark, sf):
    """ES _transform (pivot): entity-centric rollup of events by user —
    destination table hash-partitioned on the key so incremental ticks
    rewrite only changed buckets (ticks covered by tests; the gate
    checks the batch parity)."""
    import tempfile

    from mysql_es_spark.plans.transform import (
        TransformConfig,
        read_transform,
        run_transform,
    )

    cfg = TransformConfig(
        mode="pivot",
        group_by=("user_id",),
        aggs={
            "n": "count(*)",
            "total": "sum(value)",
            "last_ts": "max(ts)",
            "kinds": "count(DISTINCT event_type)",
        },
        sync_field="ts",
        n_parts=8,
    )
    dest = tempfile.mkdtemp(prefix="transform_gate_")
    run_transform(spark, _t(spark, sf, "events"), dest, cfg)
    out = read_transform(spark, dest)
    return out.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        F.round("total", 4).alias("total"),
        "last_ts",
        F.col("kinds").cast("long").alias("kinds"),
    ).orderBy("user_id")


def q_esql_pipe(spark, sf):
    """ES|QL pipe over the documents table: WHERE → EVAL → STATS BY →
    SORT → LIMIT compiled to one Catalyst plan (filter pushed to the
    scan, partial+final hash agg, TakeOrdered)."""
    from mysql_es_spark.functions.esql import esql

    docs = _t(spark, sf, "documents")
    return esql(
        """FROM documents
           | WHERE lang IN ("en", "fr") OR n_chars > 400
           | EVAL bucket = CAST(floor(n_chars / 100) AS INT)
           | STATS n = COUNT(*), total = SUM(n_chars), widest = MAX(n_chars),
                   med = MEDIAN(n_chars), nsrc = COUNT_DISTINCT(source)
             BY lang, bucket
           | SORT lang, bucket
           | LIMIT 40""",
        {"documents": docs},
    )


def q_esql_functions(spark, sf):
    """ES|QL function-tail surface (VERDICT r2 next-round #4) in one
    pipe: MV_* multivalue family, ES-argument-order date functions
    (DATE_FORMAT / DATE_DIFF / DATE_EXTRACT), CIDR_MATCH compile-time
    range rewrite, STARTS_WITH, TO_* conversions, plus the WEIGHTED_AVG
    and STD_DEV aggregates — all rewritten to JVM expressions inside ONE
    Catalyst plan (functions/esql.py _rewrite_functions)."""
    from mysql_es_spark.functions.esql import esql

    ev = _t(spark, sf, "events")
    return esql(
        """FROM events
           | EVAL ip = CONCAT("10.", TO_STRING(user_id % 200), ".0.1"),
                  w = TO_DOUBLE(user_id % 5 + 1),
                  yr = DATE_EXTRACT("year", ts),
                  day = DATE_FORMAT("yyyy-MM-dd", ts),
                  hrs = DATE_DIFF("hours", TO_TIMESTAMP("2020-01-01 00:00:00"), ts),
                  vals = array(value, value * 2, 0.0)
           | EVAL mvc = MV_COUNT(vals),
                  mvavg = ROUND(MV_AVG(vals), 4),
                  mvmin = ROUND(MV_MIN(MV_DEDUPE(vals)), 4),
                  mvtop = ROUND(MV_FIRST(MV_SORT(vals, "DESC")), 4)
           | WHERE CIDR_MATCH(ip, "10.0.0.0/9") AND STARTS_WITH(event_type, "c")
           | STATS n = COUNT(*), wavg = WEIGHTED_AVG(value, w),
                   sd = STD_DEV(value), hmin = MIN(hrs), ydist = COUNT_DISTINCT(yr),
                   mvc_max = MAX(mvc), mvavg_max = MAX(mvavg),
                   mvmin_min = MIN(mvmin), mvtop_max = MAX(mvtop)
             BY day
           | EVAL wavg = ROUND(wavg, 4), sd = ROUND(sd, 4)
           | SORT day
           | LIMIT 25""",
        {"events": ev},
    )


def q_esql_grok(spark, sf):
    """GROK pipe command (VERDICT r2 next-round #5): a syslog-shaped
    line is synthesized from event columns, then parsed back with the
    canned pattern library (%{IP} %{WORD} %{URIPATH} %{INT:…:long}
    %{LOGLEVEL}) — ONE JVM regexp per captured field, typed captures
    cast ANSI-safely — and aggregated. The oracle recomputes the same
    aggregate straight from the source columns, so every grok capture is
    value-checked."""
    from mysql_es_spark.functions.esql import esql

    ev = _t(spark, sf, "events")
    return esql(
        """FROM events
           | EVAL line = CONCAT("10.", TO_STRING(user_id % 200), ".0.7 - ",
                                event_type, " /api/v", TO_STRING(user_id % 3),
                                "/items ", TO_STRING(event_id % 1000), " ",
                                IF(value > 50, "ERROR", "INFO"))
           | GROK line "%{IP:cip} - %{WORD:method} %{URIPATH:path} %{INT:bytes:long} %{LOGLEVEL:lvl}"
           | STATS n = COUNT(*), b = SUM(bytes), cips = COUNT_DISTINCT(cip),
                   paths = COUNT_DISTINCT(path)
             BY lvl, method
           | SORT lvl, method
           | LIMIT 30""",
        {"events": ev},
    )


def q_eql_missing(spark, sf):
    """EQL 8.x missing-event sequence (VERDICT r2 next-round #6):
    ``sequence by user_id with maxspan=24h [view] ![error] [purchase]
    | head 200`` — the ![error] transition is windowed (running
    error-count + struct-max carry, operators/eql.py), no self-join;
    the head pipe is a TakeOrdered. Span is reported in exact integer
    microseconds so the oracle comparison is float-free."""
    from mysql_es_spark.operators.eql import missing, sequence_matches

    ev = _t(spark, sf, "events")
    out = sequence_matches(
        ev,
        "user_id",
        ["event_type = 'view'", missing("event_type = 'error'"), "event_type = 'purchase'"],
        tiebreak="event_id",
        maxspan_seconds=86400.0,
        head=200,
    )
    return out.select(
        "user_id",
        "start_ts",
        "end_ts",
        F.expr("timestampdiff(MICROSECOND, start_ts, end_ts)").alias("span_us"),
        "end_event_id",
    )


def q_user_history_dedup(spark, sf):
    """Sequence-level dedup: users whose ORDERED event-type history is
    identical collapse to the lowest user_id — the unit-of-dedup raised
    from a row to a whole session/conversation (one hash aggregate +
    one fp window)."""
    from mysql_es_spark.operators.dedup import dedup_sequences

    ev = _t(spark, sf, "events")
    return dedup_sequences(
        ev, "user_id", ["ts", "event_id"], "event_type"
    ).orderBy("user_id")


def q_events_percolate_filters(spark, sf):
    """Filter-context percolation: stored structured queries (SQL
    predicates) matched against every event in ONE projection — array of
    CASE-gated query ids, exploded; no joins, no shuffle."""
    from mysql_es_spark.operators.percolate import percolate_filters

    ev = _t(spark, sf, "events")
    return percolate_filters(
        spark,
        ev,
        [
            ("big", "value >= 90"),
            ("errors", "event_type = 'error'"),
            ("vip_mid", "user_id < 5 AND value > 50"),
        ],
        id_col="event_id",
    ).orderBy("event_id", "query_id")


def q_eql_sample(spark, sf):
    """EQL sample: users who have ALL of view/click/purchase (no
    ordering constraint), with the earliest example event per step —
    one map-side-combined hash aggregate, no window."""
    from mysql_es_spark.operators.eql import sample_matches

    ev = _t(spark, sf, "events")
    return sample_matches(
        ev,
        "user_id",
        ["event_type = 'view'", "event_type = 'click'", "event_type = 'purchase'"],
        tiebreak="event_id",
    ).orderBy("user_id")


def q_sessionize(spark, sf):
    ev = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("ns", new_sess)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"))
    )


def q_o4(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


def q_e2(spark, sf):
    s, c = _t(spark, sf, "supplier"), _t(spark, sf, "customer")
    return (
        s.select(F.col("s_name").alias("name"))
        .union(c.select(F.col("c_name").alias("name")))
        .distinct()
    )


def q_f4(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.select(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_f5(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.select(
        F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber")).alias("doc_key"),
        "l_quantity",
    )


def q_f7(spark, sf):
    o = _t(spark, sf, "orders")
    return o.select("o_orderkey", F.hex(F.col("o_orderkey")).alias("key_hex"))


def q_f8(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").alias("k_val")
    )


def q_f10(spark, sf):
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(F.col("o_orderkey").alias("id"), F.col("o_orderstatus").alias("st"))
        ).alias("doc_json"),
    )


def q_cube(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


def q_rollup(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


def q_bpe_tokens(spark, sf):
    return textstats.bpe_token_estimate(_t(spark, sf, "documents"))


def q_pivot(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


def q_hourly(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


def q_region_rev(spark, sf):
    o, c = _t(spark, sf, "orders"), _t(spark, sf, "customer")
    n, r = _t(spark, sf, "nation"), _t(spark, sf, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


def q_tok_count(spark, sf):
    return textstats.token_count(_t(spark, sf, "documents"))


def q_lang(spark, sf):
    return textstats.lang_id(_t(spark, sf, "documents"))


def q_quality(spark, sf):
    return textstats.quality_score(_t(spark, sf, "documents"))


def q_fp(spark, sf):
    return textstats.fingerprint(_t(spark, sf, "documents"))


def q_gopher(spark, sf):
    return textstats.gopher_quality(_t(spark, sf, "documents"))


def q_pack(spark, sf):
    return packing.pack_sequences(
        _t(spark, sf, "documents"), budget=512, n_shards=8
    )


def q_doc_chunks(spark, sf):
    """Overlapping token windows per doc (RAG/context chunker): 64-token
    chunks at stride 48 — JVM array expressions only, zero shuffle."""
    return packing.chunk_documents(_t(spark, sf, "documents"), chunk=64, stride=48)


def q_quality_top_percent(spark, sf):
    """Per-language quality-percentile curation: keep the best 40% of
    docs by quality WITHIN each lang (low-resource langs never starved)."""
    from mysql_es_spark.operators.textstats import quality_top_percent

    return quality_top_percent(_t(spark, sf, "documents"), p=0.4, by=("lang",))


def q_greedy_pack(spark, sf):
    """Doc-atomic greedy shard packing: bounded-token windows per
    (lang, md5-shard) group, never splitting a document — the writer's
    counterpart to the straddling pack_sequences layout."""
    from mysql_es_spark.operators.packing import greedy_pack

    return greedy_pack(
        _t(spark, sf, "documents"), budget=256, part_cols=("lang",), n_shards=8
    )


def q_doc_ingest(spark, sf):
    """ES ingest pipeline (processor chain as Catalyst column algebra):
    drop → gsub → lowercase → rename → set, strictly in order."""
    from mysql_es_spark.operators.ingest import apply_pipeline

    docs = _t(spark, sf, "documents").select("doc_id", "text", "lang", "source")
    return apply_pipeline(
        docs,
        [
            {"drop": {"if": "source = 'src3'"}},
            {"gsub": {"field": "text", "pattern": "[0-9]+", "replacement": "#"}},
            {"lowercase": {"field": "text"}},
            {"rename": {"field": "lang", "target_field": "language"}},
            {"set": {"field": "pipeline", "value": "v1"}},
        ],
    )


def q_contamination(spark, sf):
    """Decontamination pass: every 97th doc plays the eval set; report
    train docs sharing a 3-gram with any probe (broadcast probe join)."""
    docs = _t(spark, sf, "documents")
    probes = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    return dedup.contamination_pairs(
        docs.filter(F.col("doc_id") % 97 != 0), probes, n=3
    )


def q_pii_scrub(spark, sf):
    # the synthetic corpus has no PII, so append deterministic
    # doc_id-derived email/IP/phone text in BOTH engines — the scrub then
    # has real replacements to prove, not a no-op pass-through
    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.org from 192.168."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".9 or call +1 (555) 010-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        ).alias("text"),
    )
    return textstats.pii_scrub(d)


def q_term_freq(spark, sf):
    return textstats.term_freq_topn(_t(spark, sf, "documents"), 20)


def q_t1_edge_ngram(spark, sf):
    return textstats.edge_ngram_tokens(_t(spark, sf, "documents"), lo=2, hi=25)


def q_prefix_search(spark, sf):
    return textstats.prefix_search(_t(spark, sf, "documents"), "sca")


def q_phrase_search(spark, sf):
    return textstats.phrase_search(_t(spark, sf, "documents"), "row scan")


def q_asof(spark, sf):
    ev, o = _t(spark, sf, "events"), _t(spark, sf, "orders")
    w = W.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    right = (
        o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        right,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


def q_range_join(spark, sf):
    """Interval join with an equi prefix: hash-join on the key, the time
    range as a join-side predicate — the scalable shape (never a pure
    theta join) for event-window attribution at 100 TB."""
    li, o = _t(spark, sf, "lineitem"), _t(spark, sf, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS"))
    )
    return o.join(li, cond).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_fast_ships"))


def q_quantiles(spark, sf):
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", 0.5), 2).alias("median_price"),
        F.round(F.percentile("o_totalprice", 0.9), 2).alias("p90_price"),
    )


def q_hash_split(spark, sf):
    return sampling.hash_split(_t(spark, sf, "documents"), train_pct=80).select(
        "doc_id", "split"
    )


def q_dedup_clusters(spark, sf):
    docs = _t(spark, sf, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.15)
    return dedup.near_dup_clusters(docs, pairs)


def q_dedup_keep_best(spark, sf):
    """Quality-aware dedup winner selection: per near-dup component keep
    the doc with the greatest analyzed length (ties → smallest id)."""
    from mysql_es_spark.operators.postings import tokenized

    docs = _t(spark, sf, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.15)
    tok = tokenized(
        docs.select(F.col("doc_id").cast("long").alias("docid"), "text"),
        _docs_index_cfg(),
    )
    ids = (
        tok.filter(F.col("term").isNull())
        .select(F.col("docid").alias("doc_id"), F.col("dl").alias("q"))
    )
    return dedup.dedup_keep_best(ids, pairs, "q").orderBy("doc_id")


def q_dedup_exact(spark, sf):
    return dedup.exact_dedup(_t(spark, sf, "documents"))


def q_jaccard(spark, sf):
    return dedup.ngram_jaccard_pairs(_t(spark, sf, "documents"), n=2, threshold=0.15)


def q_bm25_direct(spark, sf):
    return direct_bm25(_t(spark, sf, "documents"), " ".join(BM25_Q1), k=20)


def q_bm25_direct2(spark, sf):
    return direct_bm25(_t(spark, sf, "documents"), " ".join(BM25_Q2), k=15)


def q_bm25_index(spark, sf):
    """Full engine: posting-block index + pruned BM25, re-keyed to doc_id."""
    ix = _index_for_documents(spark, sf)
    top = bm25_topk(
        spark, ix, " ".join(BM25_Q1), k=60, cfg=_docs_index_cfg(), mode="pruned", with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_bm25_conjunctive(spark, sf):
    """Posting-list intersection (AND semantics) over the built index with
    salt-level structural pruning; re-keyed to doc_id for the oracle."""
    ix = _index_for_documents(spark, sf)
    top = bm25_topk_conjunctive(
        spark, ix, " ".join(BM25_Q1), k=60, cfg=_docs_index_cfg(), with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


SV_WEIGHTS = {"spark": 2.0, "window": 0.5, "agg": 1.5, "scan": 0.8}


def q_sparse_vector(spark, sf):
    """ES sparse_vector (learned-sparse / ELSER-style): caller-supplied
    token weights replace idf — score = Σ w_t · BM25 tf-saturation —
    over the same posting index, block-max pruning intact."""
    from mysql_es_spark.operators.query import sparse_vector_topk

    ix = _index_for_documents(spark, sf)
    top = sparse_vector_topk(
        spark, ix, SV_WEIGHTS, k=60, cfg=_docs_index_cfg(), mode="pruned", with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_intervals_filter(spark, sf):
    """ES intervals filter rule over the positional index: source spans
    'spark join' kept only when they end BEFORE some 'query' occurrence;
    admitted docs score full-tf BM25 of the source terms (the engine's
    span convention), n_hits = surviving spans."""
    from mysql_es_spark.operators.query import intervals_filter_topk

    ix = _index_for_documents(spark, sf, positions=True)
    top = intervals_filter_topk(
        spark, ix, "spark join", "before", "query", k=60,
        cfg=_docs_index_cfg(True), with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
            "n_hits",
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(30)
    )


def q_phrase_via_index(spark, sf):
    """Indexed match_phrase: positional index + salt-pruned adjacency
    verification; BM25-scored, re-keyed to doc_id for the oracle."""
    ix = _index_for_documents(spark, sf, positions=True)
    top = phrase_topk(
        spark, ix, "row scan", k=60, cfg=_docs_index_cfg(True), with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(40)
    )


def q_prefix_via_index(spark, sf):
    """Index-backed prefix search: term_dict range scan (StartsWith
    pushdown) + best-expansion BM25; re-keyed to doc_id for the oracle."""
    ix = _index_for_documents(spark, sf)
    top = prefix_topk(
        spark, ix, "sca", k=60, cfg=_docs_index_cfg(), max_expansions=50, with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(30)
    )


def q_ngram_phrase_via_index(spark, sf):
    """Phrase over an edge-ngram index WITH positions (round-2 analyzer):
    'ro sca' is a *prefix phrase* — grams of consecutive source tokens —
    so it hits 'row scan' (search-as-you-type phrase, the ES
    only_on_same_position contract)."""
    ix = _index_for_documents(spark, sf, positions=True, ngram=True)
    top = phrase_topk(
        spark, ix, "ro sca", k=60, cfg=_docs_index_cfg(True, True), with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(40)
    )


def q_multi_match(spark, sf):
    """ES multi_match best_fields (tie_breaker=0.3) over per-field
    sub-indexes: 'spark' lives in the text field, 'src3' only in the
    source field (boost 2.0) — each field scored with its own stats."""
    from mysql_es_spark.plans.multi_field import field_dir, multi_match_topk

    root = _multi_field_index_for_documents(spark, sf)
    top = multi_match_topk(
        spark, root, "spark src3", k=60, mtype="best_fields", tie_breaker=0.3,
        cfg=_docs_index_cfg(),
    )
    fwd = spark.read.parquet(f"{field_dir(root, 'text')}/forward").select(
        "docid", F.col("conv_id").cast("long").alias("doc_id")
    )
    return (
        top.join(fwd, "docid")
        .select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(40)
    )


def q_cross_fields(spark, sf):
    """multi_match cross_fields: fields act as one logical field — per
    TERM the field contributions dis-max, then terms sum ('row'/'join'
    live in text, 'src7' only in source), so a doc covering the terms
    ACROSS fields wins."""
    from mysql_es_spark.plans.multi_field import field_dir, multi_match_topk

    root = _multi_field_index_for_documents(spark, sf)
    top = multi_match_topk(
        spark, root, "row src7 join", k=60, mtype="cross_fields",
        cfg=_docs_index_cfg(),
    )
    fwd = spark.read.parquet(f"{field_dir(root, 'text')}/forward").select(
        "docid", F.col("conv_id").cast("long").alias("doc_id")
    )
    return (
        top.join(fwd, "docid")
        .select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(40)
    )


def q_combined_fields(spark, sf):
    """ES combined_fields: fields scored as ONE synthetic field (simple
    BM25F — weighted tf/dl sums, one df/avgdl statistics space), the
    term-centric successor to cross_fields."""
    from mysql_es_spark.plans.multi_field import combined_fields_topk, field_dir

    root = _multi_field_index_for_documents(spark, sf)
    top = combined_fields_topk(
        spark, root, "row src7 join", k=60, cfg=_docs_index_cfg()
    )
    fwd = spark.read.parquet(f"{field_dir(root, 'text')}/forward").select(
        "docid", F.col("conv_id").cast("long").alias("doc_id")
    )
    return (
        top.join(fwd, "docid")
        .select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(40)
    )


def q_phrase_prefix(spark, sf):
    """ES match_phrase_prefix: 'row s' = exact token 'row' immediately
    followed by any dictionary expansion of 's' (df-desc cutoff at 4);
    per-doc score = exact-phrase BM25 of the best expansion."""
    from mysql_es_spark.operators.query import phrase_prefix_topk

    ix = _index_for_documents(spark, sf, positions=True)
    top = phrase_prefix_topk(
        spark, ix, "row s", k=60, cfg=_docs_index_cfg(True), max_expansions=4,
        with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(40)
    )


def q_bm25_date_routed(spark, sf):
    """Time-bounded search over the date-routed layout (W3): only the
    in-range period sub-indexes are read; each period scores with its OWN
    corpus statistics (ES query_then_fetch), then merges."""
    from mysql_es_spark.plans.date_routed import bm25_topk_routed

    root = _routed_index_for_documents(spark, sf)
    top = bm25_topk_routed(
        spark, root, " ".join(BM25_Q1), k=60,
        start="2026-01-03", end="2026-01-07", cfg=ROUTED_CFG, with_keys=True,
    )
    return (
        top.select(
            "period",
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(25)
    )


def q_bm25_date_routed_dfs(spark, sf):
    """dfs_query_then_fetch over the routed layout: a metadata-only first
    pass sums df/N/dl across the in-range periods, every period scores
    with the GLOBAL stats — rank-identical to one monolithic index over
    the date range."""
    from mysql_es_spark.plans.date_routed import bm25_topk_routed_dfs

    root = _routed_index_for_documents(spark, sf)
    top = bm25_topk_routed_dfs(
        spark, root, " ".join(BM25_Q1), k=25,
        start="2026-01-03", end="2026-01-07", cfg=ROUTED_CFG,
    )
    fwd_parts = []
    from mysql_es_spark.plans.date_routed import _period_dir, select_periods

    for p in select_periods(root, "2026-01-03", "2026-01-07"):
        fwd_parts.append(
            spark.read.parquet(f"{_period_dir(root, p)}/forward")
            .select(F.lit(p).alias("period"), "docid", "conv_id")
        )
    fwd = fwd_parts[0]
    for f_ in fwd_parts[1:]:
        fwd = fwd.unionByName(f_)
    return (
        top.join(fwd, ["period", "docid"], "inner")
        .select(
            "period",
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(25)
    )


def q_bool_query(spark, sf):
    """ES bool DSL over the index: must=spark, should 1-of-3 scorers,
    must_not=batch excluded in filter context (Query.java DSL analog)."""
    ix = _index_for_documents(spark, sf)
    top = bm25_bool_topk(
        spark, ix, must="spark", should="join query window", must_not="batch",
        minimum_should_match=1, k=60, cfg=_docs_index_cfg(), with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(25)
    )


def q_boosting(spark, sf):
    """ES boosting query: rank by 'spark join' BM25, docs containing
    'slow' demoted to 0.4x their score (soft must_not — demote, never
    exclude)."""
    from mysql_es_spark.operators.query import boosting_topk

    ix = _index_for_documents(spark, sf)
    top = boosting_topk(
        spark, ix, "spark join", "slow", negative_boost=0.4, k=60,
        cfg=_docs_index_cfg(), with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(40)
    )


def q_lm_quality(spark, sf):
    """Corpus unigram-LM quality score per doc (CCNet-style LM filtering,
    degenerate 1-gram): avg ln p(token) under the corpus distribution."""
    docs = _t(spark, sf, "documents")
    return textstats.lm_quality(docs).select(
        "doc_id", "n_tokens", F.round("avg_logprob", 4).alias("avg_logprob")
    )


def q_nb_classifier(spark, sf):
    """Seed-set quality classifier (CCNet/fastText-style): fit NB
    log-odds term weights on src0 (positive) vs src1 (negative), score
    every document with the length-invariant token-weight mean."""
    from mysql_es_spark.operators.textstats import classifier_score, fit_log_odds

    docs = _t(spark, sf, "documents")
    w = fit_log_odds(
        docs.filter(F.col("source") == "src0"),
        docs.filter(F.col("source") == "src1"),
    )
    return classifier_score(docs, w).select(
        "doc_id",
        "n_tokens",
        F.round("score", 4).alias("score"),
        "label",
    ).orderBy("doc_id")


PERCOLATE_QUERIES = [
    ("q_spark_join", "spark join", "all"),
    ("q_window", "window", "any"),
    ("q_agg_scan", "agg scan", "all"),
]


def q_percolate(spark, sf):
    """ES percolator (reverse search): which registered queries does each
    doc match — bool.must ('all') and match ('any') stored queries,
    broadcast term-set containment, no per-query scan."""
    from mysql_es_spark.operators.percolate import percolate

    docs = _t(spark, sf, "documents")
    return percolate(spark, docs, PERCOLATE_QUERIES)


def q_percolate_phrase(spark, sf):
    """Stored match_phrase percolation: containment prefilter, then a
    space-delimited substring probe on the joined token stream — strictly
    tighter than the same query in 'all' mode."""
    from mysql_es_spark.operators.percolate import percolate

    docs = _t(spark, sf, "documents")
    return percolate(
        spark, docs,
        [("p_spark_join", "spark join", "phrase"),
         ("a_spark_join", "spark join", "all")],
    )


def q_fuzzy_query(spark, sf):
    """Typo-tolerant search: 'qury' expands against the term dictionary
    within 1 Levenshtein edit; best-expansion BM25 per doc."""
    ix = _index_for_documents(spark, sf)
    top = fuzzy_topk(
        spark, ix, "qury", k=60, fuzziness=1, cfg=_docs_index_cfg(), with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(30)
    )


def q_phrase_slop(spark, sf):
    """Ordered proximity (match_phrase slop=2): 'row … scan' within two
    interleaving tokens, in order; BM25-scored like the exact phrase."""
    ix = _index_for_documents(spark, sf, positions=True)
    top = phrase_topk(
        spark, ix, "row scan", k=60, cfg=_docs_index_cfg(True), with_keys=True, slop=2
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(40)
    )


def q_wildcard_query(spark, sf):
    """ES wildcard query: 'sc*n' range-scans the dictionary on its
    literal prefix, regex-matches the rest, best-expansion BM25."""
    ix = _index_for_documents(spark, sf)
    top = wildcard_topk(spark, ix, "sc*n", k=60, cfg=_docs_index_cfg(), with_keys=True)
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(30)
    )


def q_bm25_filtered_alias(spark, sf):
    """Filtered alias (ES alias filter): a stored predicate rides on the
    alias pointer and plain bm25_topk through it behaves as
    filter-context search — same oracle as an explicit bool{filter}."""
    from mysql_es_spark.plans.alias import set_alias

    ix = _index_for_documents(spark, sf)
    alias = ix + "-flt-alias"
    set_alias(alias, ix, doc_filter="role = 'en' AND tool <> 'src3'")
    top = bm25_topk(
        spark, alias, " ".join(BM25_Q1), k=60, cfg=_docs_index_cfg(), with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_bm25_filtered(spark, sf):
    """Filter-context search (ES bool{must, filter}): BM25 over the index,
    candidates masked by a structural predicate on the forward table
    (lang rides as `role`, source as `tool`); scores stay corpus-global."""
    ix = _index_for_documents(spark, sf)
    top = bm25_filtered_topk(
        spark, ix, " ".join(BM25_Q1),
        doc_filter="role = 'en' AND tool <> 'src3'",
        k=60, cfg=_docs_index_cfg(), with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_match_aggs(spark, sf):
    """ES aggs: terms facet over ALL docs matching the query (not top-k) —
    per-lang match count and mean analyzed length via the index."""
    ix = _index_for_documents(spark, sf)
    out = match_aggregate(spark, ix, " ".join(BM25_Q1), ["role"], cfg=_docs_index_cfg())
    return out.select(
        F.col("role").alias("lang"),
        F.col("n_docs"),
        F.round("avg_dl", 4).alias("avg_dl"),
    )


def q_agg_date_histogram(spark, sf):
    """ES date_histogram agg: per-day bucket counts of ALL docs matching
    the query, bucketed on the forward ts (day-spread by doc_id % 10)."""
    ix = _index_for_documents(spark, sf)
    return esaggs.date_histogram(spark, ix, " ".join(BM25_Q1), cfg=_docs_index_cfg())


def q_agg_extended_stats(spark, sf):
    """ES extended_stats agg over the matched docs' analyzed length:
    count/min/max/sum/avg + population variance/stddev (ES reports the
    population moments)."""
    ix = _index_for_documents(spark, sf)
    s = esaggs.extended_stats(spark, ix, " ".join(BM25_Q1), cfg=_docs_index_cfg())
    return s.select(
        "n_docs", "min_dl", "max_dl", "sum_dl",
        F.round("avg_dl", 4).alias("avg_dl"),
        F.round("var_dl", 4).alias("var_dl"),
        F.round("std_dl", 4).alias("std_dl"),
    )


def q_agg_range(spark, sf):
    """ES range agg: explicit (overlapping allowed) [from,to) buckets
    over the matched docs' analyzed length; empty buckets kept."""
    ix = _index_for_documents(spark, sf)
    return esaggs.range_agg(
        spark, ix, " ".join(BM25_Q1), [(None, 60), (60, 90), (90, None), (50, 80)],
        cfg=_docs_index_cfg(),
    )


def q_agg_filters(spark, sf):
    """ES filters agg: named predicate buckets over the matched set
    (role carries lang, tool carries source in the documents index)."""
    ix = _index_for_documents(spark, sf)
    return esaggs.filters_agg(
        spark, ix, " ".join(BM25_Q1),
        {"en": "role = 'en'", "zh_or_fr": "role IN ('zh','fr')",
         "src0": "tool = 'src0'", "none": "role = 'xx'"},
        cfg=_docs_index_cfg(),
    )


def q_agg_composite(spark, sf):
    """ES composite agg: one page of the full (role, tool) bucket export,
    resuming strictly after the ('en','src3') key (role carries lang,
    tool carries source in the documents index)."""
    ix = _index_for_documents(spark, sf)
    return esaggs.composite_agg(
        spark, ix, " ".join(BM25_Q1), ["role", "tool"], size=10,
        after=("en", "src3"), cfg=_docs_index_cfg(),
    )


def q_agg_composite_mixed(spark, sf):
    """ES composite with mixed source types: date_histogram(day over ts) +
    terms(lang) keys, full export page in (day, role) order."""
    ix = _index_for_documents(spark, sf)
    return esaggs.composite_agg(
        spark, ix, " ".join(BM25_Q1),
        [{"day": {"date_histogram": {"field": "ts", "calendar_interval": "day"}}},
         "role"],
        size=10**6, cfg=_docs_index_cfg(),
    )


def q_agg_pipeline(spark, sf):
    """ES pipeline aggs over a date_histogram parent: cumulative_sum,
    derivative (null first bucket), moving_fn unweighted avg of the 3
    buckets strictly before the current one (shift=0), and a
    bucket_script (share of the running total)."""
    ix = _index_for_documents(spark, sf)
    out = esaggs.pipeline_agg(
        spark, ix, " ".join(BM25_Q1), window=3,
        script="cast(n_docs as double) / cum_docs", cfg=_docs_index_cfg(),
    )
    return out.select(
        "period", "n_docs", "cum_docs", "deriv",
        F.round("moving_avg", 4).alias("moving_avg"),
        F.round("script_val", 4).alias("script_val"),
    )


def _updated_index_for_documents(spark, sf_dir: str) -> str:
    """Copy of the documents index with an ES ``_update_by_query``
    applied: every doc matching 'scan' gets ' graftterm' appended to its
    text (affected buckets rebuilt, stats recomputed)."""
    src = _index_for_documents(spark, sf_dir)
    dst, marker = _ixcache_dir(sf_dir, "-upd")
    if not os.path.exists(marker):
        import shutil

        from mysql_es_spark.plans.deletes import update_by_query

        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(src, dst)
        update_by_query(
            spark, dst, {"text": "concat(text, ' graftterm')"},
            query="scan", cfg=_docs_index_cfg(),
        )
        with open(marker, "w") as f:
            f.write("ok")
    return dst


def q_update_by_query(spark, sf):
    """ES _update_by_query: docs matching 'scan' had ' graftterm'
    appended via scripted update + affected-bucket rebuild; the new term
    is searchable and ALL scores reflect the updated corpus statistics
    (doc lengths grew, avgdl shifted — exactly ES after re-indexing)."""
    ix = _updated_index_for_documents(spark, sf)
    # over-fetch then re-rank on (rounded score, external id): the engine
    # tie-breaks on internal docid, the oracle on doc_id (same convention
    # as the other index entries)
    top = bm25_topk(
        spark, ix, "graftterm window", k=60, cfg=_docs_index_cfg(),
        mode="pruned", with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_has_parent(spark, sf):
    """ES has_parent score=true: children of conversations matching the
    query, each carrying its parent's sum-rollup score (single-turn convs
    here — the multi-turn fan-out is pytest-covered on transcripts)."""
    from mysql_es_spark.operators.query import has_parent_topk

    ix = _index_for_documents(spark, sf)
    out = has_parent_topk(
        spark, ix, " ".join(BM25_Q1), k=1_000_000, score=True,
        score_mode="sum", cfg=_docs_index_cfg(), with_keys=True,
    )
    return (
        out.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(25)
    )


def q_regexp_query(spark, sf):
    """ES regexp query: anchored regex over analyzed terms, expansions
    scored best-expansion BM25; the top-level alternation exercises the
    no-prefix-pushdown correctness guard (a literal head would wrongly
    exclude the 'join' branch)."""
    from mysql_es_spark.operators.query import regexp_topk

    ix = _index_for_documents(spark, sf)
    top = regexp_topk(
        spark, ix, "s[cp]a[a-z]*|join", k=60, cfg=_docs_index_cfg(), with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(30)
    )


def q_agg_tree(spark, sf):
    """ES nested aggregations: top langs among matching docs (terms, by
    count) each with mean analyzed length, then their top sources with
    max length — a two-level bucket tree with per-level metric sub-aggs
    (lang rides as role, source as tool in the documents index)."""
    ix = _index_for_documents(spark, sf)
    spec = {
        "by_lang": {
            "terms": {"field": "role", "size": 3},
            "aggs": {
                "avg_dl": {"avg": {"field": "dl"}},
                "by_src": {
                    "terms": {"field": "tool", "size": 2},
                    "aggs": {"max_dl": {"max": {"field": "dl"}}},
                },
            },
        }
    }
    out = esaggs.agg_tree(spark, ix, " ".join(BM25_Q1), spec, cfg=_docs_index_cfg())
    return out.select(
        F.col("role").alias("lang"),
        "by_lang_count",
        F.round("avg_dl", 4).alias("avg_dl"),
        F.col("tool").alias("source"),
        "by_src_count",
        F.col("max_dl").cast("long").alias("max_dl"),
    )


def q_decontaminate(spark, sf):
    """Benchmark decontamination: training docs sharing any word 5-gram
    with the held-out eval slice (doc_id % 13 == 0) are flagged, with
    exact distinct-shingle overlap counts."""
    docs = _t(spark, sf, "documents")
    ev = docs.filter(F.col("doc_id") % 13 == 0)
    return dedup.decontaminate(docs, ev, n=5)


def q_phrase_suggest(spark, sf):
    """ES phrase suggester: per-token dictionary candidates collated and
    ranked by corpus unigram-LM likelihood minus an edit penalty."""
    from mysql_es_spark.operators.query import suggest_phrase

    ix = _index_for_documents(spark, sf)
    return suggest_phrase(
        spark, ix, "pat sot", size=5, max_edits=2, per_term=5,
        cfg=_docs_index_cfg(),
    ).select("phrase", F.round("score", 4).alias("score"), "n_edits")


EPOCH_MIX = {"en": 1.5, "zh": 2.0, "fr": 0.3}


def q_epoch_mix(spark, sf):
    """Training-mix upsampling: repeat each language's docs epochs[lang]
    times, fractional pass selected by the engine-portable md5 threshold."""
    docs = _t(spark, sf, "documents").select("doc_id", "lang")
    return sampling.epoch_mix(docs, "lang", EPOCH_MIX, id_col="doc_id").select(
        "doc_id", "lang", F.col("epoch").cast("int").alias("epoch")
    )


def q_dsir_weights(spark, sf):
    """DSIR importance log-weights (hashed-unigram, add-1 smoothing):
    how target-like ('src7' docs as the in-domain exemplar set) every
    doc's token distribution is, for importance resampling."""
    docs = _t(spark, sf, "documents")
    w = sampling.dsir_logweights(docs, F.col("source") == "src7", n_buckets=1024)
    return w.select("doc_id", "n_tokens", F.round("dsir_logw", 4).alias("dsir_logw"))


def q_dsir_sample(spark, sf):
    """DSIR resampling step: Gumbel-top-150 over the importance
    log-weights — an exact sample-without-replacement ∝ exp(weight),
    derandomized through the md5 contract."""
    docs = _t(spark, sf, "documents")
    w = sampling.dsir_logweights(docs, F.col("source") == "src7", n_buckets=1024)
    top = sampling.dsir_select(w, k=150, seed="dsir")
    return top.select("doc_id", F.round("gumbel_key", 4).alias("gumbel_key"))


def q_temperature_mix(spark, sf):
    """Temperature-based domain rebalancing (tau=0.7, budget=input
    size): small sources upsampled, large ones thinned, realized as
    deterministic fractional epochs."""
    docs = _t(spark, sf, "documents").select("doc_id", "source")
    return sampling.temperature_mix(docs, "source", tau=0.7).select(
        "doc_id", "source", F.col("epoch").cast("int").alias("epoch")
    )


def q_dup_spans(spark, sf):
    """Exact-substring dedup: merged cut spans of 5-token windows whose
    token sequence occurs elsewhere (first occurrence kept)."""
    docs = _t(spark, sf, "documents")
    return dedup.dup_spans(docs, n=5, min_count=2).select(
        "doc_id",
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("end"),
        "n_windows",
    )


def q_hybrid_rrf(spark, sf):
    """Hybrid retrieval (ES 8.x rrf): BM25 top-40 over the inverted index
    fused with cosine top-40 over the aligned embeddings table by
    reciprocal-rank fusion — ranks computed on the 4-dp-rounded scores so
    both engines rank identically."""
    from mysql_es_spark.operators.fusion import rrf_fuse, with_rank

    ix = _index_for_documents(spark, sf)
    order = [F.desc("s"), F.asc("doc_id")]
    # fetch with margin (k=60), then cut the 40-list on the ROUNDED score
    # — the same boundary convention as the bm25_via_index entry, so both
    # engines agree on membership, not just order
    bm = (
        bm25_topk(
            spark, ix, " ".join(BM25_Q1), k=60, cfg=_docs_index_cfg(), mode="pruned",
            with_keys=True,
        )
        .select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("s"),
        )
        .orderBy(*order)
        .limit(40)
    )
    emb = _t(spark, sf, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    vec = (
        similarity.cosine_topk(emb, qv, k=60)
        .select(F.col("vec_id").alias("doc_id"), F.col("cos").alias("s"))
        .orderBy(*order)
        .limit(40)
    )
    fused = rrf_fuse(
        [with_rank(bm, order), with_rank(vec, order)], k=20, score_decimals=6
    )
    return fused.select(
        "doc_id", F.round("score", 6).alias("score"), "n_retrievers"
    )


def q_hybrid_knn(spark, sf):
    """ES knn-section + query hybrid (pre-RRF): score = bm25 + 5.0 x
    cosine over the aligned embeddings, docs from the union, missing
    retriever contributes 0; inputs and the fused sum rank on rounded
    scores."""
    from mysql_es_spark.operators.fusion import linear_fuse

    ix = _index_for_documents(spark, sf)
    bm = bm25_topk(
        spark, ix, " ".join(BM25_Q1), k=20_000, cfg=_docs_index_cfg(), with_keys=True
    ).select(
        F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("s")
    )
    emb = _t(spark, sf, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    vec = similarity.cosine_topk(emb, qv, k=20_000).select(
        F.col("vec_id").alias("doc_id"), F.col("cos").alias("s")
    )
    fused = linear_fuse([(bm, 1.0), (vec, 5.0)], k=20, score_decimals=4)
    return fused.select("doc_id", F.round("score", 4).alias("score"), "n_retrievers")


def q_bm25_count(spark, sf):
    """ES _count: matching live docs, presence-only decode, no scoring."""
    from mysql_es_spark.operators.query import match_count

    ix = _index_for_documents(spark, sf)
    return match_count(spark, ix, " ".join(BM25_Q1), cfg=_docs_index_cfg())


MGET_KEYS = ["7:0", "42:0", "123:0", "999999:0"]  # last one misses


def q_doc_mget(spark, sf):
    """ES _mget: stored docs fetched by identity; misses are absent."""
    from mysql_es_spark.operators.query import get_docs

    ix = _index_for_documents(spark, sf)
    return get_docs(spark, ix, MGET_KEYS).select(
        "doc_key", "conv_id", "turn_idx", "role", "text", "tool"
    )


def q_agg_cardinality(spark, sf):
    """ES cardinality agg: distinct sources (tool field) among matching
    docs — exact two-level distinct here; the HLL++ variant (the literal
    ES algorithm) is exercised by pytest."""
    ix = _index_for_documents(spark, sf)
    return esaggs.cardinality(spark, ix, " ".join(BM25_Q1), "tool", cfg=_docs_index_cfg())


def q_agg_top_hits(spark, sf):
    """ES terms+top_hits agg: the 3 best BM25 hits per language bucket —
    a per-bucket rank window over the full matched set, never top-k."""
    ix = _index_for_documents(spark, sf)
    th = esaggs.top_hits(
        spark, ix, " ".join(BM25_Q1), "role", size=3, cfg=_docs_index_cfg(), order_round=4
    )
    fwd = spark.read.parquet(f"{ix}/forward").select("docid", "conv_id")
    return th.join(fwd, "docid", "inner").select(
        F.col("role").alias("lang"),
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


def q_agg_significant_terms(spark, sf):
    """ES significant_terms agg (JLH): terms over-represented in the
    matched set vs the corpus; foreground df from one tokenize pass over
    matched docs, background df free from the index's term_dict."""
    ix = _index_for_documents(spark, sf)
    st = esaggs.significant_terms(
        spark, ix, " ".join(BM25_Q1), size=12, min_doc_count=3, cfg=_docs_index_cfg()
    )
    return st.select("term", "fg_df", "bg_df", F.round("jlh", 6).alias("jlh"))


def q_agg_significant_text(spark, sf):
    """ES significant_text: JLH with filter_duplicate_text — exact dup
    texts contribute once (which duplicate survives is irrelevant to the
    fg counts, so engine/oracle representative choice can differ)."""
    ix = _index_for_documents(spark, sf)
    st = esaggs.significant_text(
        spark, ix, " ".join(BM25_Q1), size=12, min_doc_count=3, cfg=_docs_index_cfg()
    )
    return st.select("term", "fg_df", "bg_df", F.round("jlh", 6).alias("jlh"))


def q_agg_date_range(spark, sf):
    """ES date_range agg: explicit [from, to) timestamp buckets (open ends,
    one overlapping) over the matched docs' forward ts; empty kept."""
    ix = _index_for_documents(spark, sf)
    return esaggs.date_range_agg(
        spark, ix, " ".join(BM25_Q1),
        [(None, "2026-01-04"), ("2026-01-04", "2026-01-08"),
         ("2026-01-08", None), ("2026-01-03", None)],
        cfg=_docs_index_cfg(),
    )


def q_agg_multi_terms(spark, sf):
    """ES multi_terms agg: top (lang, source) composite buckets of the
    matched set by doc count, tie key-asc."""
    ix = _index_for_documents(spark, sf)
    return esaggs.multi_terms_agg(
        spark, ix, " ".join(BM25_Q1), ["role", "tool"], size=10, cfg=_docs_index_cfg()
    ).select(F.col("role").alias("lang"), F.col("tool").alias("source"), "n_docs")


def q_agg_rare_terms(spark, sf):
    """ES rare_terms agg: the long-tail sources (matched-doc count <= 23)
    rarest-first — the inverse cutoff of a terms agg."""
    ix = _index_for_documents(spark, sf)
    return esaggs.rare_terms_agg(
        spark, ix, " ".join(BM25_Q1), "tool", max_doc_count=23, cfg=_docs_index_cfg()
    ).select(F.col("tool").alias("source"), "n_docs")


def q_agg_adjacency_matrix(spark, sf):
    """ES adjacency_matrix agg: named filters + pairwise intersections
    (empty intersections dropped) over the matched set."""
    ix = _index_for_documents(spark, sf)
    return esaggs.adjacency_matrix_agg(
        spark, ix, " ".join(BM25_Q1),
        {"en": "role = 'en'", "zh": "role = 'zh'", "s0": "tool = 'src0'"},
        cfg=_docs_index_cfg(),
    )


def q_agg_weighted_avg(spark, sf):
    """ES weighted_avg agg, index-native: mean analyzed doc length weighted
    by each matched doc's total query-term tf (postings-only, no forward
    join)."""
    ix = _index_for_documents(spark, sf)
    return esaggs.weighted_avg_agg(spark, ix, " ".join(BM25_Q1), cfg=_docs_index_cfg())


def q_agg_sampler(spark, sf):
    """ES diversified_sampler + terms sub-agg: a document-order sample of
    the matched set capped at 3 docs per language, then source facets over
    the <=60-doc sample only."""
    ix = _index_for_documents(spark, sf)
    return esaggs.diversified_sampler_agg(
        spark, ix, " ".join(BM25_Q1), "role", "tool",
        shard_size=60, max_docs_per_value=3, cfg=_docs_index_cfg(),
    ).select(F.col("tool").alias("source"), "n_docs")


def q_agg_bucket_sort(spark, sf):
    """ES bucket_sort pipeline agg: the parent date_histogram's buckets
    re-ranked by doc count (tie period-asc), page [1, 5)."""
    ix = _index_for_documents(spark, sf)
    return esaggs.bucket_sort_agg(
        spark, ix, " ".join(BM25_Q1), size=4, offset=1, cfg=_docs_index_cfg()
    )


def q_agg_serial_diff(spark, sf):
    """ES serial_diff pipeline agg: lag-3 differencing of the daily bucket
    stream (null while the lag window is unfilled, as ES emits)."""
    ix = _index_for_documents(spark, sf)
    return esaggs.serial_diff_agg(spark, ix, " ".join(BM25_Q1), lag=3, cfg=_docs_index_cfg())


def q_agg_stats_bucket(spark, sf):
    """ES sibling pipeline aggs (avg/min/max/sum/stats_bucket) in one row
    over the date_histogram's n_docs stream, extremes keyed by period."""
    ix = _index_for_documents(spark, sf)
    return esaggs.stats_bucket_agg(spark, ix, " ".join(BM25_Q1), cfg=_docs_index_cfg())


def q_bm25_highlight(spark, sf):
    """ES highlight block: top-k BM25 via the index, every query-term
    occurrence in the stored text wrapped in <em></em> (whole-field mode,
    number_of_fragments=0) — pure JVM regexp on the k fetched rows."""
    from mysql_es_spark.operators.highlight import highlight_terms

    ix = _index_for_documents(spark, sf)
    top = bm25_topk(
        spark, ix, " ".join(BM25_Q1), k=60, cfg=_docs_index_cfg(), mode="pruned",
        with_keys=True,
    )
    return (
        highlight_terms(top, BM25_Q1)
        .select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
            F.col("highlight"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_bm25_compacted(spark, sf):
    """Segment compaction (ES _forcemerge analog): decode → re-encode the
    multi-wave index into one packed wave; ranking must be unchanged."""
    ix = _compacted_index_for_documents(spark, sf)
    top = bm25_topk(
        spark, ix, " ".join(BM25_Q2), k=60, cfg=_docs_index_cfg(), mode="pruned",
        with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(15)
    )


def q_more_like_this(spark, sf):
    """ES more_like_this: top tf·idf terms of doc 42 become a BM25 query;
    the source doc is excluded from the hits."""
    ix = _index_for_documents(spark, sf)
    src = (
        spark.read.parquet(f"{ix}/forward")
        .filter(F.col("conv_id") == "42")
        .select("docid")
        .collect()[0][0]
    )
    top = more_like_this_topk(
        spark, ix, src, k=15, max_query_terms=5, cfg=_docs_index_cfg(), with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(15)
    )


def _deleted_index_for_documents(spark: SparkSession, sf_dir: str) -> str:
    """Copy of the base documents index with docs containing 'batch'
    soft-deleted via delete_by_query (the ES _delete_by_query analog)."""
    from mysql_es_spark.plans.deletes import delete_by_query

    base = _index_for_documents(spark, sf_dir)
    ix, marker = _ixcache_dir(sf_dir, "-del")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(ix, ignore_errors=True)
        shutil.copytree(base, ix)
        os.remove(os.path.join(ix, "_COMPLETE"))  # copied base marker
        delete_by_query(spark, ix, "batch", cfg=_docs_index_cfg())
        with open(marker, "w") as f:
            f.write("ok")
    return ix


def _purged_index_for_documents(spark: SparkSession, sf_dir: str) -> str:
    """The soft-deleted index physically merged (forcemerge analog):
    deleted docs purged, term_dict/corpus_stats recomputed."""
    from mysql_es_spark.plans.compact import compact_index

    src = _deleted_index_for_documents(spark, sf_dir)
    dst, marker = _ixcache_dir(sf_dir, "-purged")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(dst, ignore_errors=True)
        compact_index(spark, src, dst)
        with open(marker, "w") as f:
            f.write("ok")
    return dst


def q_bm25_deleted(spark, sf):
    """Soft deletes (ES pre-merge): docs containing 'batch' are deleted
    and vanish from the hits, but idf/avgdl still count them — surviving
    docs keep their exact pre-delete scores."""
    ix = _deleted_index_for_documents(spark, sf)
    top = bm25_topk(
        spark, ix, " ".join(BM25_Q2), k=60, cfg=_docs_index_cfg(), mode="pruned",
        with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_bm25_purged(spark, sf):
    """Post-merge (forcemerge purge): the deleted docs are physically
    gone, so scores equal a from-scratch index over the survivors —
    idf/avgdl shift exactly as ES scores shift after a merge."""
    ix = _purged_index_for_documents(spark, sf)
    top = bm25_topk(
        spark, ix, " ".join(BM25_Q2), k=60, cfg=_docs_index_cfg(), mode="pruned",
        with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_term_suggest(spark, sf):
    """ES term suggester: closest dictionary terms to the typo 'qury',
    Lucene DirectSpellChecker ranking (distance, df desc, term)."""
    from mysql_es_spark.operators.query import suggest_terms

    ix = _index_for_documents(spark, sf)
    return suggest_terms(
        spark, ix, "jin prt stram", size=5, max_edits=2, cfg=_docs_index_cfg()
    )


def q_terms_enum(spark, sf):
    """ES _terms_enum: dictionary prefix autocomplete — two search_after
    pages of terms starting with 's', concatenated, with doc frequency.
    Pure term_dict range scan (StartsWith pushdown); paging before the
    limit so deep pages stay O(size)."""
    from mysql_es_spark.operators.query import terms_enum

    ix = _index_for_documents(spark, sf)
    p1 = terms_enum(spark, ix, "s", size=3)
    cursor = p1.orderBy(F.col("term").desc()).limit(1).collect()[0]["term"]
    p2 = terms_enum(spark, ix, "s", size=3, search_after=cursor)
    return p1.unionByName(p2).orderBy("term")


def q_bm25_explain(spark, sf):
    """ES _explain: the per-term BM25 factor breakdown for the top-1 hit
    of Q1 — (term, tf, dl, df, idf, tf_norm, contrib) rows that sum to
    the ranked score."""
    from mysql_es_spark.operators.query import explain_score

    ix = _index_for_documents(spark, sf)
    top = bm25_topk(spark, ix, " ".join(BM25_Q1), k=1, cfg=_docs_index_cfg(), mode="pruned")
    target = int(top.collect()[0]["docid"])
    out = explain_score(spark, ix, " ".join(BM25_Q1), target, cfg=_docs_index_cfg())
    return out.select(
        "term", "tf", "dl", "df",
        F.round("idf", 6).alias("idf"),
        F.round("tf_norm", 6).alias("tf_norm"),
        F.round("contrib", 6).alias("contrib"),
    )


def q_bm25_collapse(spark, sf):
    """ES collapse: top-5 hits with at most one per language (role) —
    groups ranked by their best-scoring doc."""
    from mysql_es_spark.operators.query import bm25_collapse_topk

    ix = _index_for_documents(spark, sf)
    out = bm25_collapse_topk(
        spark, ix, " ".join(BM25_Q1), "role", k=5, cfg=_docs_index_cfg(), order_round=4
    )
    fwd = spark.read.parquet(f"{ix}/forward").select("docid", "conv_id")
    return out.join(fwd, "docid", "inner").select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
        F.col("role").alias("lang"),
    )


def q_bm25_collapse_inner_hits(spark, sf):
    """ES collapse + inner_hits: the top-5 language groups (ranked by
    their best hit) each expanded to their 3 best hits."""
    from mysql_es_spark.operators.query import bm25_collapse_topk

    ix = _index_for_documents(spark, sf)
    out = bm25_collapse_topk(
        spark, ix, " ".join(BM25_Q1), "role", k=5, cfg=_docs_index_cfg(),
        order_round=4, inner_hits=3,
    )
    fwd = spark.read.parquet(f"{ix}/forward").select("docid", "conv_id")
    return out.join(fwd, "docid", "inner").select(
        F.col("role").alias("lang"),
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
        F.col("hit_rank").cast("int").alias("hit_rank"),
    )


def q_agg_children(spark, sf):
    """ES children agg: matched docs bucketed by language, each bucket
    stepping down to every turn of its matching conversations (single-
    turn convs here; multi-turn fan-out is pytest-covered)."""
    out = esaggs.children_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        bucket_field="role", cfg=_docs_index_cfg(),
    )
    return out.select(
        F.col("role").alias("lang"), "n_parents", "n_children",
        F.round("avg_child_dl", 4).alias("avg_child_dl"),
    )


def q_agg_parent(spark, sf):
    """ES parent agg: matched docs bucketed by language, stepping UP to
    their (single-turn) conversations — each parent counted once per
    bucket; multi-turn dedup is pytest-covered."""
    out = esaggs.parent_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        bucket_field="role", cfg=_docs_index_cfg(),
    )
    return out.select(
        F.col("role").alias("lang"), "n_parents",
        F.round("avg_parent_turns", 4).alias("avg_parent_turns"),
        F.round("avg_parent_dl", 4).alias("avg_parent_dl"),
    )


def q_hybrid_linear(spark, sf):
    """ES linear retriever: minmax-normalize each retriever's top-40
    window to [0,1], then weighted sum (BM25 0.7, cosine 0.3)."""
    from mysql_es_spark.operators.fusion import linear_fuse

    ix = _index_for_documents(spark, sf)
    order = [F.desc("s"), F.asc("doc_id")]
    bm = (
        bm25_topk(
            spark, ix, " ".join(BM25_Q1), k=60, cfg=_docs_index_cfg(), mode="pruned",
            with_keys=True,
        )
        .select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("s"),
        )
        .orderBy(*order)
        .limit(40)
    )
    emb = _t(spark, sf, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    vec = (
        similarity.cosine_topk(emb, qv, k=60)
        .select(F.col("vec_id").alias("doc_id"), F.col("cos").alias("s"))
        .orderBy(*order)
        .limit(40)
    )
    fused = linear_fuse(
        [(bm, 0.7), (vec, 0.3)], k=20, score_decimals=6, normalize="minmax"
    )
    return fused.select(
        "doc_id", F.round("score", 6).alias("score"), "n_retrievers"
    )


def q_conv_topk(spark, sf):
    """has_child score_mode=sum: conversation ranking by member-turn
    scores (documents are single-turn convs here; the multi-turn case is
    pytest-covered on the transcripts corpus)."""
    from mysql_es_spark.operators.query import conv_topk

    ix = _index_for_documents(spark, sf)
    out = conv_topk(spark, ix, " ".join(BM25_Q1), k=20, score_mode="sum", cfg=_docs_index_cfg())
    return out.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
        F.col("n_hits"),
    ).orderBy(F.col("score").desc(), F.col("doc_id").asc())


def q_term_vectors(spark, sf):
    """ES _termvectors for doc 42: (term, tf, positions) straight from
    the positional index — salt-pruned block decode, no re-tokenize."""
    from mysql_es_spark.operators.query import term_vectors

    ix = _index_for_documents(spark, sf, positions=True)
    docid = (
        spark.read.parquet(f"{ix}/forward")
        .filter(F.col("conv_id") == "42")
        .select("docid")
        .collect()[0][0]
    )
    out = term_vectors(spark, ix, int(docid), cfg=_docs_index_cfg(True))
    return out.select(
        "term",
        "tf",
        F.concat_ws(",", F.col("positions").cast("array<string>")).alias("positions"),
    )


def q_mterm_vectors(spark, sf):
    """ES _mtermvectors for docs 7/42/123: one salt-pruned pass decodes
    each surviving posting block exactly once for all three docs."""
    from mysql_es_spark.operators.query import term_vectors_multi

    ix = _index_for_documents(spark, sf, positions=True)
    fwd = (
        spark.read.parquet(f"{ix}/forward")
        .filter(F.col("conv_id").isin(["7", "42", "123"]))
        .select("conv_id", "docid")
        .collect()
    )
    ids = {int(r.conv_id): int(r.docid) for r in fwd}
    out = term_vectors_multi(
        spark, ix, list(ids.values()), cfg=_docs_index_cfg(True)
    )
    back = {d: c for c, d in ids.items()}
    mapping = F.create_map(
        [F.lit(x) for kv in back.items() for x in kv]
    )
    return out.select(
        mapping[F.col("docid")].cast("long").alias("doc_id"),
        "term",
        "tf",
        F.concat_ws(",", F.col("positions").cast("array<string>")).alias("positions"),
    )


def q_bm25_span_near(spark, sf):
    """Lucene SpanNear inOrder=false: 'scan row' in ANY order within a
    1+slop window (slop=2); BM25-scored over the pair, via the
    positional index's vectorized min-window sweep."""
    ix = _index_for_documents(spark, sf, positions=True)
    top = phrase_topk(
        spark, ix, "scan row", k=200, cfg=_docs_index_cfg(True),
        slop=2, ordered=False, with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(40)
    )


def q_agg_percentiles(spark, sf):
    """ES percentiles agg: linearly-interpolated dl percentiles over the
    matched set (exact; the TDigest-style approx path is pytest-covered)."""
    ix = _index_for_documents(spark, sf)
    out = esaggs.percentiles(spark, ix, " ".join(BM25_Q1), [0.25, 0.5, 0.9], cfg=_docs_index_cfg())
    return out.select("pct", F.round("value", 6).alias("value"))


SYN_MAP = {"spark": ["stream"], "join": ["merge"], "query": ["filter"]}


def _syn_index_for_documents(spark, sf_dir):
    """Index built with the index-time synonym rule spark<->stream."""
    ix, marker = _ixcache_dir(sf_dir, "-syn")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(ix, ignore_errors=True)
        docs = _documents_as_transcripts(_t(spark, sf_dir, "documents"))
        build_index(
            spark, docs, ix, _docs_index_cfg().with_(synonyms=("spark, stream",))
        )
        with open(marker, "w") as f:
            f.write("ok")
    return ix


def q_bm25_index_synonyms(spark, sf):
    """Index-time synonyms (spark<->stream injected at the same position):
    querying either member scores the merged class — tf sums both surface
    forms, df counts docs containing either, dl stays the original token
    count (Lucene discountOverlaps)."""
    ix = _syn_index_for_documents(spark, sf)
    top = bm25_topk(
        spark, ix, "stream", k=60,
        cfg=_docs_index_cfg().with_(synonyms=("spark, stream",)),
        mode="pruned", with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_bm25_synonyms(spark, sf):
    """Query-time synonym expansion, dis-max per clause: spark|stream,
    join|merge, query|filter — best expansion scores, never double-counts."""
    from mysql_es_spark.operators.query import synonym_topk

    ix = _index_for_documents(spark, sf)
    top = synonym_topk(
        spark, ix, " ".join(BM25_Q1), SYN_MAP, k=60, cfg=_docs_index_cfg(), with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_bm25_query_string(spark, sf):
    """ES query_string: 'spark AND (join OR merge) -batch' — an arbitrary
    boolean tree over analyzed terms, evaluated in one postings pass
    (matched-term set per doc + positive-occurrence BM25 sum)."""
    from mysql_es_spark.operators.query import query_string_topk

    ix = _index_for_documents(spark, sf)
    top = query_string_topk(
        spark, ix, "spark AND (join OR merge) -batch", k=60, cfg=_docs_index_cfg(),
        with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_bm25_rescore(spark, sf):
    """ES rescore: the BM25 top-40 window re-ranked by a match_phrase
    rescorer ('row scan', weight 2, score_mode=total); positions are
    decoded only for the window candidates' salt ranges."""
    from mysql_es_spark.operators.query import rescore_topk

    ix = _index_for_documents(spark, sf, positions=True)
    top = rescore_topk(
        spark, ix, " ".join(BM25_Q1), "row scan", k=15, window_size=40,
        rescore_weight=2.0, score_mode="total", cfg=_docs_index_cfg(True),
        with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(15)
    )


def q_bm25_function_score(spark, sf):
    """ES function_score: BM25 multiplied by a gauss recency decay on the
    forward ts (origin 2026-01-05, scale 3 days, decay 0.5). Pruning is
    off by contract (an upper bound on BM25 says nothing about BM25·f);
    every matched doc is scored once and re-ranked."""
    from mysql_es_spark.operators.query import function_score_topk, gauss_decay

    ix = _index_for_documents(spark, sf)
    top = function_score_topk(
        spark, ix, " ".join(BM25_Q1), gauss_decay("ts", "2026-01-05", 3.0),
        k=60, cfg=_docs_index_cfg(), with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


MSEARCH_QS = {"q1": " ".join(BM25_Q1), "q2": " ".join(BM25_Q2), "q3": "stream merge sort"}


def q_bm25_msearch(spark, sf):
    """ES _msearch as ONE plan: top-10 per query for a batch of queries —
    the union of all terms' postings is scanned/decoded once, shared
    terms fan out via a broadcast (term→qid) join, and a per-qid rank
    window keeps each query's top-k distributed."""
    from mysql_es_spark.operators.query import bm25_topk_multi

    ix = _index_for_documents(spark, sf)
    out = bm25_topk_multi(spark, ix, MSEARCH_QS, k=10, cfg=_docs_index_cfg(), order_round=4)
    fwd = spark.read.parquet(f"{ix}/forward").select("docid", "conv_id")
    keyed = out.join(fwd, "docid", "inner").select(
        "qid",
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
    )
    # re-rank on the EXTERNAL id: the engine tie-breaks equal rounded
    # scores by internal docid (bucketed — a different order than doc_id),
    # the oracle by doc_id; rank must follow the id space the oracle sees
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return keyed.withColumn("rank", F.row_number().over(w).cast("int"))


def q_hard_negatives(spark, sf):
    """BM25 hard-negative mining (retrieval training data): per labeled
    query, top-10 retrieved minus judged positives, one shared msearch
    plan; ranks live in the external id space."""
    from mysql_es_spark.operators.rankeval import mine_hard_negatives

    ix = _index_for_documents(spark, sf)
    req = {
        "q1": (MSEARCH_QS["q1"], {277, 7}),
        "q2": (MSEARCH_QS["q2"], set()),
        "q3": (MSEARCH_QS["q3"], {100}),
    }
    out = mine_hard_negatives(spark, ix, req, k=10, cfg=_docs_index_cfg())
    return out.select(
        "qid",
        F.col("ext_id").alias("doc_id"),
        F.round("score", 4).alias("score"),
        "neg_rank",
    )


DIS_MAX_SUBS = ["spark join", "query batch", "scan"]
# judgements mix retrieved docs (graded, scattered ranks) and docs the
# query never returns — so every metric path (hit, miss, graded gain) is
# exercised with non-degenerate values at the gate's sf0.01
RANK_EVAL_REQS = {
    "q1": (" ".join(BM25_Q1), {277: 3, 483: 1, 241: 2, 103: 1, 7: 2, 399: 1}),
    "q2": (" ".join(BM25_Q2), {42: 3, 222: 2, 345: 1, 5: 1}),
}


def q_bm25_dis_max(spark, sf):
    """ES dis_max: best sub-query score + tie_breaker × the rest; the
    union of all sub-queries' postings decoded once, contributions fanned
    out to sub-queries by a broadcast join ('spark' and 'scan' overlap
    BM25_Q1/Q2 so shared-term fan-out is exercised)."""
    ix = _index_for_documents(spark, sf)
    top = dis_max_topk(
        spark, ix, DIS_MAX_SUBS, tie_breaker=0.3, k=60, cfg=_docs_index_cfg(), with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_bm25_rank_eval(spark, sf):
    """ES _rank_eval: precision@k / recall@k / MRR / nDCG for a labeled
    query batch, computed from one shared msearch plan."""
    from mysql_es_spark.operators.rankeval import rank_eval

    ix = _index_for_documents(spark, sf)
    out = rank_eval(spark, ix, RANK_EVAL_REQS, k=10, cfg=_docs_index_cfg())
    return out.select(
        "qid",
        "retrieved",
        F.round("precision_k", 6).alias("precision_k"),
        F.round("recall_k", 6).alias("recall_k"),
        F.round("mrr", 6).alias("mrr"),
        F.round("ndcg", 6).alias("ndcg"),
    ).orderBy("qid")


def q_bm25_search_after(spark, sf):
    """ES search_after pagination: page 2 of the Q1 ranking — the page-1
    tail (score, docid) becomes a cursor filter on scored rows, so deep
    pages stay O(k) driver-side (never offset materialization)."""
    ix = _index_for_documents(spark, sf)
    p1 = bm25_topk(spark, ix, " ".join(BM25_Q1), k=20, cfg=_docs_index_cfg(), mode="pruned").collect()
    cursor = (float(p1[-1]["score"]), int(p1[-1]["docid"]))
    top = bm25_topk(
        spark, ix, " ".join(BM25_Q1), k=15, cfg=_docs_index_cfg(), mode="pruned",
        after=cursor, with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(15)
    )


def q_lm_dirichlet(spark, sf):
    """Pluggable similarity: Dirichlet-smoothed query likelihood (Lucene
    LMDirichletSimilarity, ES similarity:LMDirichlet) over the same
    posting index — only term_dict.ttf and corpus token count are extra."""
    from mysql_es_spark.operators.query import lm_dirichlet_topk

    ix = _index_for_documents(spark, sf)
    top = lm_dirichlet_topk(
        spark, ix, " ".join(BM25_Q1), k=60, mu=2000.0, cfg=_docs_index_cfg(),
        with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


STRATA_FR = {"en": 0.5, "es": 0.25, "fr": 0.1}


def q_doc_stratified(spark, sf):
    """Deterministic stratified sampling: per-lang keep rates decided by
    a content hash (integer threshold compare — reproducible on any
    engine, invariant under partitioning), never a seeded RNG."""
    return sampling.stratified_sample(
        _t(spark, sf, "documents"), "lang", STRATA_FR, default=0.02
    ).select("doc_id", "lang")


def q_emb_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.cosine_topk(emb, [float(x) for x in qv], k=10)


def q_emb_knn_filtered(spark, sf):
    """ES kNN with filter context: exact cosine top-k restricted to a
    structural predicate (label = 2) BEFORE the search — all k hits
    satisfy the filter, ES's pre-filter semantics."""
    emb = _t(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.cosine_topk(emb, [float(x) for x in qv], k=10, where="label = 2")


def q_emb_sq_topk(spark, sf):
    """ES int8-quantized kNN: scalar-quantize every vector to 256 levels
    over [-1, 1] (normalized components), then approximate cosine top-10
    in the compressed domain — whole-stage-codegen zip_with/aggregate
    over the 4x-smaller code table. Fixed bounds keep the entry
    deterministic; the quantile-trained path is tests/test_sq.py."""
    emb = _t(spark, sf, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    codes = similarity.sq_encode(emb, -1.0, 1.0)
    scored = similarity.sq_topk(codes, qv, -1.0, 1.0, k=1_000_000)
    return (
        scored.select("vec_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
    )


def q_emb_bbq_hamming(spark, sf):
    """1-bit binary-quantized kNN (BBQ-style): sign bits packed 64/long,
    ranked by Hamming distance (xor + bit_count per word, whole-stage
    codegen over the 32x-compressed table). Centroid 0 keeps the entry
    deterministic AND SQL-checkable — normalization preserves sign, so
    the oracle counts per-dimension sign disagreements directly; the
    centroid-trained path and the exact-rerank contract are
    tests/test_sq.py."""
    emb = _t(spark, sf, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]]
    dim = len(qv)
    bits = similarity.bbq_encode(emb, [0.0] * dim)
    return (
        similarity.bbq_topk(bits, qv, [0.0] * dim, k=10)
        .select("vec_id", F.col("hamming").cast("int").alias("hamming"))
    )


def q_emb_near_dups(spark, sf):
    return dedup.embedding_near_dups(_t(spark, sf, "embeddings"), threshold=0.30)


# --- rows-only (no SQL oracle: internal hash functions / approx / stubs) ---


def q_winnow(spark, sf):
    """base_hash='md5' makes the whole winnowing pipeline reproducible in
    the DuckDB oracle (md5_number_upper == little-endian first 8 digest
    bytes), upgrading this entry from rows-only to a full tri-match."""
    return dedup.winnow_overlap_pairs(
        _t(spark, sf, "documents"), k=4, window=4, min_shared=2, max_fp_df=50,
        base_hash="md5",
    )


def q_minhash(spark, sf):
    """base_hash='md5' (DuckDB md5_number_upper) + inlined permutation
    constants make the complete MinHash-LSH pipeline — shingle hash,
    64 universal-hash mins, 16-way banding, candidate join, exact-verify
    — reproducible in ANSI SQL, upgrading this from rows-only to a full
    tri-match."""
    return dedup.minhash_lsh_pairs(
        _t(spark, sf, "documents"), n=2, num_perm=64, bands=16, threshold=0.15,
        base_hash="md5",
    )


def q_incremental_dedup(spark, sf):
    """Incremental near-dup ingest: docs >= 400 arrive as a new batch and
    dedup against a persisted MinHash store of docs < 400 — the store is
    signatures+bands only (old texts never re-read); md5 base hash makes
    the whole signature/band/estimate pipeline reproducible in SQL."""
    from mysql_es_spark.operators.dedup import build_minhash_store, store_near_dups

    d, marker = _ixcache_dir(sf, "-mhstore")
    docs = _t(spark, sf, "documents").select("doc_id", "text")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        build_minhash_store(
            spark, docs.filter("doc_id < 400"), d,
            n=2, num_perm=64, bands=16, seed=42, base_hash="md5",
        )
        with open(marker, "w") as f:
            f.write("ok")
    out = store_near_dups(
        spark, docs.filter("doc_id >= 400"), d,
        threshold=0.15, include_new_pairs=True,
    )
    return out.select(
        "doc_id", "dup_of", F.round("est_jaccard", 4).alias("est_jaccard")
    )


def q_simhash(spark, sf):
    """max_hamming=3 (the banding completeness bound) + md5 base hash: the
    oracle recomputes SimHash brute-force in SQL, so this also proves the
    4x16 band candidate generation loses nothing at k<=3."""
    return dedup.simhash_near_dups(
        _t(spark, sf, "documents"), max_hamming=3, base_hash="md5"
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def q_ann(spark, sf):
    emb = _t(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.ann_topk(emb, [float(x) for x in qv], k=10, n_planes=8, multiprobe=3)


def q_ivf(spark, sf):
    emb = _t(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.ivf_topk(emb, [float(x) for x in qv], k=10, n_cells=16, n_probe=4)


def q_pq(spark, sf):
    """PQ ANN: 4x16 codebook ADC shortlist (compressed scan, no vector
    reads) + exact re-rank of 100 candidates."""
    emb = _t(spark, sf, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    B = similarity.pq_codebooks(emb, m=4, ksub=16, seed=7)
    codes = similarity.pq_encode(emb, B)
    return similarity.pq_topk(codes, qv, B, k=10, emb=emb, rerank=100)


def q_ivf_full_probe(spark, sf):
    """IVF with every cell probed degenerates to exact brute force — the
    tri-match anchor for the IVF machinery (the approximate n_probe<cells
    path stays recall-tested in pytest and rows-only as emb_ann_ivf_topk)."""
    emb = _t(spark, sf, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0]]
    return similarity.ivf_topk(emb, qv, k=10, n_cells=8, n_probe=8, seed=3)


def q_pq_rerank_exact(spark, sf):
    """PQ with a corpus-wide re-rank shortlist equals exact brute force —
    the tri-match anchor for the PQ codec + ADC + re-rank machinery."""
    emb = _t(spark, sf, "embeddings")
    n = emb.count()
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0]]
    B = similarity.pq_codebooks(emb, m=4, ksub=16, seed=7)
    codes = similarity.pq_encode(emb, B)
    return similarity.pq_topk(codes, qv, B, k=10, emb=emb, rerank=int(n)).select(
        "vec_id", F.col("score").alias("cos")
    )


def q_mm_features(spark, sf):
    """Real decode: WAV samples and PNG/PPM pixels are actually parsed
    (functions/media_codecs.py); only video rows use digest features."""
    return multimodal.extract_features(
        multimodal.synth_media(spark, 48), real=True, on_video="fake"
    ).select("media_id", "kind", "n_bytes")


def q_mm_features_hash(spark, sf):
    """Fixture-hash anchor for the REAL media decode path (upgrades
    mm_feature_extract from rows-only): every synth_media payload is
    seed-deterministic, so the md5 of each row's rounded feature vector
    is a constant — the oracle is a VALUES fixture of those constants,
    and any regression in the WAV/PNG/PPM decoders or the feature math
    (functions/media_codecs.py, operators/multimodal.py) breaks the
    hash. Video rows exercise the digest fallback deterministically."""
    feats = multimodal.extract_features(
        multimodal.synth_media(spark, 48), real=True, on_video="fake"
    )
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    "feature", lambda x: F.round(x.cast("double"), 5).cast("string")
                ),
            )
        ).alias("feat_hash"),
    ).orderBy("media_id")


def q_mm_video_mjpeg_hash(spark, sf):
    """Fixture-hash anchor for REAL video decode: video rows carry MJPEG
    payloads (concatenated baseline JPEGs from the pure-numpy codec,
    functions/media_codecs.encode_jpeg) and real=True decodes actual
    frames — Huffman, dequant, IDCT, YCbCr — into temporal features
    (operators/multimodal._video_features). The md5 of each rounded
    feature vector is seed-deterministic, so the oracle is a VALUES
    fixture; any codec or feature regression breaks the hash."""
    feats = multimodal.extract_features(
        multimodal.synth_media(spark, 12, video_format="mjpeg"), real=True
    )
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    "feature", lambda x: F.round(x.cast("double"), 5).cast("string")
                ),
            )
        ).alias("feat_hash"),
    ).orderBy("media_id")


def q_mm_frames(spark, sf):
    return multimodal.frame_sample(multimodal.synth_media(spark, 48), fps=0.5)


def q_constant_score(spark, sf):
    """ES constant_score: filter-context match (any Q1 term), every live
    match scores exactly the boost; k covers the whole match set so the
    output is the full filter result ordered by doc_id."""
    ix = _index_for_documents(spark, sf)
    top = constant_score_topk(
        spark, ix, " ".join(BM25_Q1), k=100_000, boost=1.5, cfg=_docs_index_cfg(),
        with_keys=True,
    )
    return top.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
    ).orderBy("doc_id")


def q_distance_feature(spark, sf):
    """ES distance_feature (date form): BM25 over Q2 plus the additive
    hyperbolic recency feature boost*pivot/(pivot+|ts-origin| days)."""
    ix = _index_for_documents(spark, sf)
    top = distance_feature_topk(
        spark, ix, " ".join(BM25_Q2), "2026-01-05", 3.0, k=30, boost=2.0,
        cfg=_docs_index_cfg(), with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(30)
    )


def q_pinned(spark, sf):
    """ES pinned query: doc_keys 42/7/99 promoted in list order ahead of
    the organic Q1 BM25 ranking; the organic duplicate is dropped."""
    ix = _index_for_documents(spark, sf)
    top = pinned_topk(
        spark, ix, " ".join(BM25_Q1), ["42:0", "7:0", "99:0"], k=20,
        cfg=_docs_index_cfg(), with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_match_bool_prefix(spark, sf):
    """ES match_bool_prefix 'join s': term clause 'join' + prefix clause
    's' (multi-expansion: small/scan/slow/stream/sort/spark/...) in
    bool-should — score = term BM25 + best-expansion BM25."""
    ix = _index_for_documents(spark, sf)
    top = match_bool_prefix_topk(
        spark, ix, "join s", k=90, cfg=_docs_index_cfg(), max_expansions=50,
        with_keys=True,
    )
    # cut on the ROUNDED score (the oracle's ordering) with 3x operator
    # headroom: raw-score near-ties at the k boundary otherwise flip
    # membership between engines at denser corpus scales
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(30)
    )


def q_span_first(spark, sf):
    """ES span_first(span_term 'scan', end=3): docs whose first 'scan'
    sits in the first 3 tokens, BM25-scored from the positional index."""
    ix = _index_for_documents(spark, sf, positions=True)
    top = span_first_topk(
        spark, ix, "scan", end=3, k=30, cfg=_docs_index_cfg(True), with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(30)
    )


def q_terms_set(spark, sf):
    """ES terms_set with minimum_should_match_field: each doc's required
    match count over Q2 comes from its own columns (1 + doc_id % 3)."""
    ix = _index_for_documents(spark, sf)
    top = terms_set_topk(
        spark, ix, BM25_Q2, msm_expr="1 + pmod(cast(conv_id as int), 3)",
        k=30, cfg=_docs_index_cfg(), with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(30)
    )


def q_ids(spark, sf):
    """ES ids query: constant-score membership fetch; the missing key is
    skipped silently."""
    ix = _index_for_documents(spark, sf)
    top = ids_topk(
        spark, ix, ["5:0", "17:0", "123:0", "999999:0"], k=10,
        cfg=_docs_index_cfg(), with_keys=True,
    )
    return top.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
    ).orderBy("doc_id")


def q_simple_query_string(spark, sf):
    """ES simple_query_string 'window | (agg + scan) -spark': the lenient
    end-user operator syntax translated onto the query_string engine."""
    ix = _index_for_documents(spark, sf)
    top = simple_query_string_topk(
        spark, ix, "window | (agg + scan) -spark", k=60, cfg=_docs_index_cfg(),
        with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_span_not(spark, sf):
    """ES span_not: 'scan' occurrences NOT immediately preceded by 'row'
    (pre=1, post=0) — the anti-phrase filter; BM25-scored with surviving
    occurrence counts from the positional index."""
    from mysql_es_spark.operators.query import span_not_topk

    ix = _index_for_documents(spark, sf, positions=True)
    top = span_not_topk(
        spark, ix, "scan", "row", pre=1, post=0, k=90, cfg=_docs_index_cfg(True),
        with_keys=True,
    )
    # rounded-cut discipline (see q_match_bool_prefix)
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(30)
    )


def q_agg_global(spark, sf):
    """ES global bucket: matched-vs-corpus doc counts and average
    analyzed length in one response row."""
    ix = _index_for_documents(spark, sf)
    row = esaggs.global_agg(spark, ix, " ".join(BM25_Q1), cfg=_docs_index_cfg())
    return row.select(
        "n_matched",
        F.round("avg_dl_matched", 4).alias("avg_dl_matched"),
        "n_total",
        F.round("avg_dl_total", 4).alias("avg_dl_total"),
    )


def q_completion_suggest(spark, sf):
    """ES completion suggester analog: highest-df dictionary terms
    extending the prefix, straight off a StartsWith-pruned term_dict
    range scan."""
    from mysql_es_spark.operators.query import suggest_completion

    ix = _index_for_documents(spark, sf)
    return suggest_completion(spark, ix, "s", size=6).select(
        "suggestion", F.col("weight").cast("long").alias("weight")
    )


def q_min_score(spark, sf):
    """ES request-level min_score over the pruned BM25 path: every hit at
    or above the floor (k exceeds the match count), floor composed into
    the block-max tau logic."""
    ix = _index_for_documents(spark, sf)
    top = bm25_topk(
        spark, ix, " ".join(BM25_Q1), k=100_000, cfg=_docs_index_cfg(),
        mode="pruned", min_score=0.35, with_keys=True,
    )
    return top.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
    ).orderBy(F.col("score").desc(), F.col("doc_id").asc())


def q_exists(spark, sf):
    """ES exists query on the forward 'tool' field (all docs carry a
    source → full corpus in filter context, constant score)."""
    from mysql_es_spark.operators.query import exists_topk

    ix = _index_for_documents(spark, sf)
    top = exists_topk(
        spark, ix, "tool", k=10**6, boost=1.0, cfg=_docs_index_cfg(), with_keys=True
    )
    return top.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
    ).orderBy("doc_id")


def q_dedup_ingest(spark, sf):
    """Streaming dedup-on-ingest driven as two explicit epochs over the
    documents table (doc_id < 250 arrives first): the accepted union is
    the content-level first-occurrence set, first-wins by (epoch,
    doc_key)."""
    import tempfile

    from mysql_es_spark.streaming.dedup_ingest import dedup_batch

    docs = _documents_as_transcripts(_t(spark, sf, "documents"))
    out = tempfile.mkdtemp(prefix="dedup_ingest_gate_")
    dedup_batch(spark, docs.filter(F.col("conv_id").cast("long") < 250), 0, out)
    dedup_batch(spark, docs.filter(F.col("conv_id").cast("long") >= 250), 1, out)
    return (
        spark.read.parquet(f"{out}/accepted")
        .select(F.col("conv_id").cast("long").alias("doc_id"))
        .orderBy("doc_id")
    )


def q_curation(spark, sf):
    """Composed curation pipeline: Gopher shape filters → en/es allowlist
    → exact content dedup (first id wins) → deterministic split tag."""
    from mysql_es_spark.operators.curation import curate

    return curate(
        _t(spark, sf, "documents"), langs=("en", "es"), train_pct=80
    ).orderBy("doc_id")


def q_match_aggs_runtime(spark, sf):
    """ES runtime_mappings: terms agg over a query-time computed field
    (text-length bucket) — no reindex, scan pruned to the expression's
    input column."""
    ix = _index_for_documents(spark, sf)
    out = match_aggregate(
        spark, ix, " ".join(BM25_Q1), ["len_bucket"], cfg=_docs_index_cfg(),
        runtime={"len_bucket": "cast(floor(length(text) / 200) * 200 as long)"},
    )
    return out.select(
        "len_bucket", "n_docs", F.round("avg_dl", 4).alias("avg_dl")
    ).orderBy("len_bucket")


def q_semantic_dedup(spark, sf):
    """SemDeDup exact anchor: n_cells=1 makes the cell-bucketed path
    corpus-wide exact — components of the cosine>=0.3 pair graph, keep
    the minimum vec_id per component."""
    from mysql_es_spark.operators.dedup import semantic_dedup

    return semantic_dedup(
        _t(spark, sf, "embeddings"), threshold=0.3, n_cells=1
    ).orderBy("vec_id")


def q_match_export(spark, sf):
    """Scroll-replacement bulk export: EVERY Q1 match with its score —
    the full scored set, never a top-k window."""
    from mysql_es_spark.operators.query import match_export

    ix = _index_for_documents(spark, sf)
    out = match_export(spark, ix, " ".join(BM25_Q1), cfg=_docs_index_cfg(), with_keys=True)
    return out.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
    ).orderBy("doc_id")


def q_match_export_slice(spark, sf):
    """Sliced export (ES sliced scroll): slice 1 of 3 of the full Q1
    match set, membership by the md5 contract on the external key —
    disjoint and collectively exhaustive across consumers."""
    from mysql_es_spark.operators.query import match_export

    ix = _index_for_documents(spark, sf)
    out = match_export(
        spark, ix, " ".join(BM25_Q1), cfg=_docs_index_cfg(), with_keys=True,
        slice_id=1, slice_max=3,
    )
    return out.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
    ).orderBy("doc_id")


def q_parent_id(spark, sf):
    """ES parent_id query: all live children of conversation '42' at the
    boost score (single-turn convs here; multi-turn is pytest-covered)."""
    from mysql_es_spark.operators.query import parent_id_topk

    ix = _index_for_documents(spark, sf)
    out = parent_id_topk(spark, ix, "42", k=100, boost=1.5, with_keys=True)
    return out.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.round("score", 4).alias("score"),
    )


def q_phrase_synonym(spark, sf):
    """Synonym-graph match_phrase (span_near over span_or): 'row' followed
    by merge|window at the next position; per-slot dis-max scoring."""
    from mysql_es_spark.operators.query import phrase_synonym_topk

    ix = _index_for_documents(spark, sf, positions=True)
    top = phrase_synonym_topk(
        spark, ix, ["row", ["merge", "window"]], k=60, cfg=_docs_index_cfg(True),
        with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(40)
    )


def q_agg_percentile_ranks(spark, sf):
    """ES percentile_ranks: % of Q1-matched docs at or below each dl
    value (exact path)."""
    out = esaggs.percentile_ranks(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1), [5.0, 8.0, 12.0],
        cfg=_docs_index_cfg(),
    )
    return out.select("value", F.round("pct", 4).alias("pct")).orderBy("value")


def q_agg_top_metrics(spark, sf):
    """ES top_metrics: the dl of the matched doc ranked first by the
    (unique) conv_id sort key — deterministic single-row answer."""
    row = esaggs.top_metrics(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        sort_col="conv_id", metric_cols=("dl",), cfg=_docs_index_cfg(),
    )
    return row.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("dl").cast("long").alias("dl"),
    )


def q_agg_value_count(spark, sf):
    """ES value_count: non-null values of a forward field among matched
    docs (tool == documents.source)."""
    return esaggs.value_count(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1), "tool",
        cfg=_docs_index_cfg(),
    )


def q_agg_mad(spark, sf):
    """ES median_absolute_deviation over matched docs' analyzed length
    (exact, linear-interpolated medians)."""
    out = esaggs.median_absolute_deviation(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1), cfg=_docs_index_cfg()
    )
    return out.select(F.round("mad", 4).alias("mad"))


def q_agg_boxplot(spark, sf):
    """ES boxplot agg: min/q1/q2/q3/max of matched docs' analyzed length."""
    out = esaggs.boxplot_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1), cfg=_docs_index_cfg()
    )
    return out.select(
        "min_dl",
        F.round("q1", 4).alias("q1"),
        F.round("q2", 4).alias("q2"),
        F.round("q3", 4).alias("q3"),
        "max_dl",
    )


def q_agg_string_stats(spark, sf):
    """ES string_stats over matched docs' raw text: count, char-length
    min/max/avg, Shannon entropy of the pooled character distribution."""
    out = esaggs.string_stats(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1), cfg=_docs_index_cfg()
    )
    return out.select(
        "n_values", "min_len", "max_len",
        F.round("avg_len", 4).alias("avg_len"),
        F.round("entropy", 4).alias("entropy"),
    )


def q_agg_categorize(spark, sf):
    """ES categorize_text: matched docs grouped into message categories by
    their first stable (letter-only) tokens; digit-bearing tokens are the
    variable parts ES's categorizer masks out."""
    return esaggs.categorize_text(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        max_tokens=4, size=12, cfg=_docs_index_cfg(),
    )


def q_agg_frequent_item_sets(spark, sf):
    """ES frequent_item_sets (market-basket): transactions = users, items
    = the event types each user triggered; singleton + pair supports."""
    return esaggs.frequent_item_sets_df(
        _t(spark, sf, "events"), "user_id", "event_type",
        min_support=0.2, size=10,
    )


def q_agg_sampler_stats(spark, sf):
    """ES sampler agg: length stats restricted to the top-20 BM25 matches
    (plain sampler; agg_sampler covers the diversified variant)."""
    out = esaggs.sampler_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        shard_size=20, cfg=_docs_index_cfg(),
    )
    return out.select(
        "n_docs", "min_dl", "max_dl", F.round("avg_dl", 4).alias("avg_dl")
    )


def q_agg_random_sampler(spark, sf):
    """ES random_sampler agg: length stats over a deterministic 50%
    sample of the Q1 matches, doc_count reported background-scaled
    (sampled count / probability)."""
    out = esaggs.random_sampler_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        probability=0.5, seed="rs", cfg=_docs_index_cfg(),
    )
    return out.select("n_sampled", "doc_count", F.round("avg_dl", 4).alias("avg_dl"))


BUCKET_CORR_INDICATOR = [1.0, 2.0, 3.0, 4.0, 5.0, 1.0, 2.0, 3.0, 4.0, 5.0]


def q_agg_bucket_correlation(spark, sf):
    """ES bucket_correlation pipeline agg: Pearson correlation between
    the Q1 day-histogram's bucket counts and a caller indicator series."""
    out = esaggs.bucket_correlation_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        BUCKET_CORR_INDICATOR, cfg=_docs_index_cfg(),
    )
    return out.select("n_buckets", F.round("corr", 4).alias("corr"))


def q_agg_change_point(spark, sf):
    """ES change_point pipeline agg (step form): the day-histogram split
    maximizing the Welch t-statistic between prefix and suffix means."""
    return esaggs.change_point_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        cfg=_docs_index_cfg(),
    )


def q_terms_lookup(spark, sf):
    """ES terms query with terms LOOKUP: the filter term set is doc 7's
    analyzed text fetched at query time; every match scores the boost."""
    from mysql_es_spark.operators.query import terms_lookup_topk

    ix = _index_for_documents(spark, sf)
    docs = _t(spark, sf, "documents")
    top = terms_lookup_topk(
        spark, ix, docs, F.col("doc_id") == 7, k=100_000, boost=1.0,
        cfg=_docs_index_cfg(), with_keys=True,
    )
    return top.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
    ).orderBy("doc_id")


def q_emb_knn_min_sim(spark, sf):
    """ES kNN similarity floor: exact cosine top-50 but vectors under
    0.2 similarity are dropped before the cut (page may come back
    short)."""
    emb = _t(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.cosine_topk(emb, [float(x) for x in qv], k=50, min_sim=0.2)


def q_agg_percentiles_bucket(spark, sf):
    """ES percentiles_bucket: exact percentiles of the day-histogram's
    n_docs bucket stream."""
    out = esaggs.percentiles_bucket_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        percents=(25.0, 50.0, 90.0), cfg=_docs_index_cfg(),
    )
    return out.select("pct", F.round("value", 4).alias("value"))


def q_agg_normalize(spark, sf):
    """ES normalize pipeline agg (percent_of_sum) over the day buckets."""
    out = esaggs.normalize_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        method="percent_of_sum", cfg=_docs_index_cfg(),
    )
    return out.select("period", "n_docs", F.round("value", 4).alias("value"))


def q_agg_cumulative_cardinality(spark, sf):
    """ES cumulative_cardinality: distinct tools (documents.source) seen
    up to each day bucket among matched docs."""
    return esaggs.cumulative_cardinality_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        field="tool", cfg=_docs_index_cfg(),
    )


def q_bm25_rank_feature(spark, sf):
    """ES rank_feature (saturation): BM25 over Q1 plus the additive
    static-feature signal boost·f/(f+pivot), f = char length."""
    top = rank_feature_topk(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        feature="length(text)", function="saturation", pivot=200.0,
        boost=2.0, k=25, cfg=_docs_index_cfg(), with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(25)
    )


def q_agg_matrix_stats(spark, sf):
    """ES matrix_stats: population moments + covariance/correlation of
    (analyzed length, char length) over the matched docs."""
    r = esaggs.matrix_stats_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1), cfg=_docs_index_cfg()
    )
    return r.select(
        "n",
        *[F.round(c, 4).alias(c) for c in (
            "mean_x", "var_x", "skew_x", "kurt_x",
            "mean_y", "var_y", "skew_y", "kurt_y", "cov_xy", "corr_xy",
        )],
    )


def q_agg_t_test(spark, sf):
    """ES t_test (Welch): analyzed lengths of Q1-matched vs Q2-matched."""
    r = esaggs.t_test_agg(
        spark, _index_for_documents(spark, sf),
        " ".join(BM25_Q1), " ".join(BM25_Q2), cfg=_docs_index_cfg(),
    )
    return r.select("n_a", "n_b", F.round("t", 4).alias("t"), F.round("df", 4).alias("df"))


def q_agg_rate(spark, sf):
    """ES rate agg: day-bucket doc counts as per-hour rates."""
    r = esaggs.rate_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        interval="day", unit="hour", cfg=_docs_index_cfg(),
    )
    return r.select("period", "n_docs", F.round("rate", 4).alias("rate"))


def q_bm25_intervals(spark, sf):
    """ES intervals query: any_of( match 'row scan' max_gaps=2 ordered,
    all_of(row, any_of(merge|window)) consecutive ) — per-doc dis-max of
    the two positional branches."""
    from mysql_es_spark.operators.query import intervals_topk

    rule = {
        "any_of": {
            "intervals": [
                {"match": {"query": "row scan", "max_gaps": 2, "ordered": True}},
                {
                    "all_of": {
                        "intervals": [
                            {"match": {"query": "row"}},
                            {"any_of": {"intervals": [
                                {"match": {"query": "merge"}},
                                {"match": {"query": "window"}},
                            ]}},
                        ],
                        "ordered": True,
                    }
                },
            ]
        }
    }
    ix = _index_for_documents(spark, sf, positions=True)
    top = intervals_topk(spark, ix, rule, k=40, cfg=_docs_index_cfg(True), with_keys=True)
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(40)
    )


def q_agg_auto_date_histogram(spark, sf):
    """ES auto_date_histogram, target 12 buckets: the documents index
    spans 10 midnight-anchored days, so hour overflows (>216) and day
    (10 <= 12) is the finest fitting rung — the oracle fixes 'day'."""
    return esaggs.auto_date_histogram(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        target_buckets=12, cfg=_docs_index_cfg(),
    )


def q_agg_scripted_metric(spark, sf):
    """ES scripted_metric (algebraic form): avg chars-per-token over
    matched docs, finalized to per-100-tokens."""
    r = esaggs.scripted_metric_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        "length(text) / dl", combine="avg", finalize_sql="value * 100",
        cfg=_docs_index_cfg(),
    )
    return r.select(F.round("value", 4).alias("value"))


def q_agg_moving_percentiles(spark, sf):
    """ES moving_percentiles: trailing-3-bucket median of the day
    histogram's doc counts."""
    r = esaggs.moving_percentiles_agg(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        interval="day", window=3, pct=50.0, cfg=_docs_index_cfg(),
    )
    return r.select("period", "n_docs", F.round("moving_pct", 4).alias("moving_pct"))


def q_agg_vwh(spark, sf):
    """ES variable_width_histogram (rows-only: the agglomerative merge is
    not SQL-expressible; determinism + reference-equality covered by
    tests/test_vwh.py): 6 variable-width doc-length clusters of the Q1
    match set."""
    return esaggs.variable_width_histogram(
        spark, _index_for_documents(spark, sf), " ".join(BM25_Q1),
        buckets=6, cfg=_docs_index_cfg(),
    ).select("key", "min_dl", "max_dl", "n_docs")


def q_agg_vwh_exact(spark, sf):
    """Exact-config anchor for variable_width_histogram (upgrades it
    from rows-only, the same pattern as emb_ivf_full_probe): at
    buckets=1 the agglomerative merge collapses to (weighted mean, min,
    max, count) of the match set's doc lengths, and at buckets >= the
    distinct-value count no merge happens at all (one cluster per
    distinct dl) — both ends are ANSI-SQL-expressible, so the clustering
    scaffold, the match-set plumbing, and the weighting are tri-matched;
    the interior merge order stays covered by tests/test_vwh.py."""
    ix = _index_for_documents(spark, sf)
    q = " ".join(BM25_Q1)
    one = esaggs.variable_width_histogram(spark, ix, q, buckets=1, cfg=_docs_index_cfg())
    sep = esaggs.variable_width_histogram(
        spark, ix, q, buckets=1 << 20, max_distinct=1 << 20, cfg=_docs_index_cfg()
    )
    return (
        one.withColumn("cfg", F.lit("merge_all"))
        .unionByName(sep.withColumn("cfg", F.lit("no_merge")))
        .select(
            "cfg", F.round("key", 4).alias("key"), "min_dl", "max_dl", "n_docs"
        )
        .orderBy("cfg", "min_dl")
    )


def q_seeded_shuffle(spark, sf):
    """Deterministic training-data shuffle: the first 100 documents of
    the seed='ep1' global permutation (ORDER BY md5('ep1:'||id), id) —
    a TakeOrdered over a pure projection, engine-portable by the md5
    contract."""
    from mysql_es_spark.operators.sampling import seeded_shuffle

    docs = _t(spark, sf, "documents").select("doc_id")
    return (
        seeded_shuffle(docs, "ep1")
        .orderBy("shuffle_key", "doc_id")
        .limit(100)
        .select("doc_id", "shuffle_key")
    )


def q_sorted_search(spark, sf):
    """ES sort-by-field search + search_after deep paging: the
    filter-context match set of Q1 ordered by (lang asc, ts desc,
    conv_id asc) — page 2 of size 40, where the cursor is page 1's full
    tail tuple. The oracle takes rows 41..80 of the same total order."""
    from mysql_es_spark.operators.query import sorted_search

    ix = _index_for_documents(spark, sf)
    sort = [("role", "asc"), ("ts", "desc"), ("conv_id", "asc")]
    q = " ".join(BM25_Q1)
    p1 = sorted_search(spark, ix, q, sort, size=40, cfg=_docs_index_cfg()).collect()
    last = p1[-1]
    p2 = sorted_search(
        spark, ix, q, sort, size=40,
        search_after=[last.role, last.ts, last.conv_id, last.docid],
        cfg=_docs_index_cfg(),
    )
    return p2.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("role").alias("lang"),
        F.col("ts"),
    ).orderBy("doc_id")


def q_runtime_sorted(spark, sf):
    """ES runtime fields (runtime_mappings): sort the filter-context
    match set of Q1 on a query-time computed field (text length) that
    was never indexed — compiled to a Catalyst column, column pruning
    intact. conv_id asc makes the order total before the docid tiebreak
    can fire, so the DuckDB oracle reproduces it exactly."""
    from mysql_es_spark.operators.query import sorted_search

    ix = _index_for_documents(spark, sf)
    out = sorted_search(
        spark, ix, " ".join(BM25_Q1),
        [("tlen", "desc"), ("conv_id", "asc")], size=40,
        runtime_mappings={"tlen": "length(text)"}, cfg=_docs_index_cfg(),
    )
    return out.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("tlen").cast("long").alias("tlen"),
    ).orderBy("doc_id")


def q_cdc_posting_merge(spark, sf):
    """CDC posting-level merge fast path (streaming/posting_merge.py):
    copy the cached documents index, apply an UPDATE-ONLY batch that
    REPLACES the text of every doc_id % 97 == 3 row (its old terms must
    be masked out of existing posting blocks, the new terms spliced in,
    and term stats adjusted by exact +/- deltas), assert the merge path
    actually ran (not the wave-rebuild fallback), then answer BM25 over
    Q1 + the new term against the merged index. The oracle recomputes
    BM25 in SQL over the post-update corpus, so any stale posting, leaked
    old term, or drifted df/avgdl breaks rank or score."""
    import shutil

    from mysql_es_spark.streaming.incremental import incremental_update

    src_ix = _index_for_documents(spark, sf)
    ix, marker = _ixcache_dir(sf, "-cdcmerge")
    if not os.path.exists(marker):
        shutil.rmtree(ix, ignore_errors=True)
        shutil.copytree(src_ix, ix)
        docs = _t(spark, sf, "documents")
        upd = F.when(
            F.col("doc_id") % 97 == 3,
            F.concat(
                F.lit("mrgupdx mrgupdx uniqz"), (F.col("doc_id") % 7).cast("string")
            ),
        ).otherwise(F.col("text"))
        v2 = _documents_as_transcripts(docs.withColumn("text", upd))
        changed = docs.filter(F.col("doc_id") % 97 == 3).select(
            F.col("doc_id").cast("string").alias("conv_id")
        )
        res = incremental_update(spark, v2, changed, ix, _docs_index_cfg(), batch_id=3)
        if res.get("mode") != "posting_merge":
            raise RuntimeError(f"expected posting_merge path, got {res}")
        with open(marker, "w") as f:
            f.write("ok")
    top = bm25_topk(
        spark, ix, " ".join(BM25_Q1) + " mrgupdx", k=60, cfg=_docs_index_cfg(),
        mode="pruned", with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_river_jdbc_build(spark, sf):
    """JDBC river end-to-end (round 4, VERDICT r3 item 5 — the
    reference's actual front door: mysql/Dumper.java:90-152 bulk dump,
    canal binlog tail): the first 400 documents (by doc_id) are loaded
    into an embedded Derby database, river-built into an index via
    spark.read.jdbc (sources/jdbc.py), and queried with pruned BM25.
    The oracle recomputes BM25 in SQL over the same 400 parquet rows, so
    any row lost/mangled in the RDBMS round-trip (encoding, NULL
    handling, case-folded identifiers) breaks rank or score."""
    from mysql_es_spark.sources.jdbc import derby_url, load_derby_fixture, river_build

    cfg = IndexConfig(n_buckets=2, wave_size=2, salt_docs=1 << 20, term_buckets=4)
    ix, marker = _ixcache_dir(sf, "-riverjdbc")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(ix, ignore_errors=True)
        docs = (
            _t(spark, sf, "documents")
            .orderBy("doc_id")
            .limit(400)
            .select("doc_id", "lang", "text", "source")
            .collect()
        )  # bounded: 400 fixture rows to seed the RDBMS
        rows = [
            (str(r["doc_id"]), 0, r["lang"], r["text"], r["source"], "2026-01-01 00:00:00")
            for r in docs
        ]
        db = os.path.join(ix + "_db", "riverdb")
        shutil.rmtree(ix + "_db", ignore_errors=True)
        load_derby_fixture(spark, db, rows)
        river_build(spark, derby_url(db), "transcripts", ix, cfg)
        with open(marker, "w") as f:
            f.write("ok")
    top = bm25_topk(
        spark, ix, " ".join(BM25_Q1), k=60, cfg=cfg, mode="pruned", with_keys=True
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_river_cdc_feed(spark, sf):
    """Log-based CDC feed (round 5, VERDICT r4 item 3 — the reference's
    steady state is a binlog TAIL, canal/Canal.java:108-129, not a
    re-dump): copy the cached documents index, write a Debezium-shaped
    change directory (op c/u/d + after-image rows: text of
    doc_id % 97 == 11 replaced, doc_id % 103 == 9 deleted, three new
    docs inserted), and apply it with river_cdc_feed
    (streaming/cdc_feed.py) — O(delta): the tick reads the feed plus the
    index's own forward table for the affected buckets, never a source
    snapshot, never a diff join. The oracle recomputes BM25 in SQL over
    the post-change corpus, so a leaked deleted doc, stale term, or
    missed insert breaks rank or score."""
    import shutil

    from mysql_es_spark.streaming.cdc_feed import river_cdc_feed

    cfg = _docs_index_cfg()
    src_ix = _index_for_documents(spark, sf)
    ix, marker = _ixcache_dir(sf, "-cdcfeed")
    if not os.path.exists(marker):
        shutil.rmtree(ix, ignore_errors=True)
        shutil.copytree(src_ix, ix)
        docs = _t(spark, sf, "documents")
        upd = docs.filter(
            (F.col("doc_id") % 97 == 11) & (F.col("doc_id") % 103 != 9)
        ).withColumn(
            "text",
            F.concat(F.lit("cdcfeedy cdcfeedy fdq"), (F.col("doc_id") % 5).cast("string")),
        )
        dele = docs.filter(F.col("doc_id") % 103 == 9)
        ins = spark.createDataFrame(
            [
                (1000000001, "fresh cdcfeedy doc spark join"),
                (1000000002, "another cdcfeedy query window"),
                (1000000003, "third cdcfeedy insert scan"),
            ],
            "doc_id long, text string",
        ).select(
            "doc_id", F.lit("en").alias("lang"), "text", F.lit("feed").alias("source")
        )
        feed = (
            _documents_as_transcripts(upd).withColumn("op", F.lit("u"))
            .unionByName(_documents_as_transcripts(ins).withColumn("op", F.lit("c")))
            .unionByName(
                _documents_as_transcripts(dele)
                .withColumn("op", F.lit("d"))
                .withColumn("text", F.lit(None).cast("string"))
            )
            .withColumn("seq", F.lit(None).cast("long"))
            .select("op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "seq")
        )
        feed_dir = ix + "_feed"
        shutil.rmtree(feed_dir, ignore_errors=True)
        feed.write.parquet(feed_dir)
        res = river_cdc_feed(spark, feed_dir, ix, cfg, batch_id=5)
        if not res["ops"] or "delete" not in res["ops"]:
            raise RuntimeError(f"change feed did not apply: {res}")
        with open(marker, "w") as f:
            f.write("ok")
    top = bm25_topk(
        spark, ix, " ".join(BM25_Q1) + " cdcfeedy", k=60, cfg=cfg,
        mode="pruned", with_keys=True,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# deterministic synthetic coordinates from the doc identity — the
# runtime-field pattern (operators/geo.py): same closed-form in Spark
# (over forward.conv_id) and DuckDB (over documents.doc_id)
_GEO_RM = {
    "lat": "(cast(conv_id as bigint) * 37 % 17000) / 100.0 - 85.0",
    "lon": "(cast(conv_id as bigint) * 73 % 36000) / 100.0 - 180.0",
}
_GEO_SQL_LAT = "(doc_id * 37 % 17000) / 100.0 - 85.0"
_GEO_SQL_LON = "(doc_id * 73 % 36000) / 100.0 - 180.0"
_GEO_ORIGIN = (12.5, 42.0)
_GEO_RADIUS_KM = 7000.0


def q_geo_distance_search(spark, sf):
    """ES bool{must: match, filter: geo_distance} (round 5 — the geo
    surface the round-4 disposition left to ES dynamic mappings,
    template.json:64-130): BM25 over Q1 restricted to docs within
    7000 km of (12.5, 42.0), coordinates supplied as runtime fields.
    The oracle recomputes the same haversine + BM25 in SQL."""
    from mysql_es_spark.operators.geo import geo_distance_topk

    ix = _index_for_documents(spark, sf)
    top = geo_distance_topk(
        spark, ix, " ".join(BM25_Q1), _GEO_ORIGIN[0], _GEO_ORIGIN[1],
        _GEO_RADIUS_KM, k=20, cfg=_docs_index_cfg(), with_keys=True,
        runtime_mappings=_GEO_RM,
    )
    return (
        top.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_geo_distance_sorted(spark, sf):
    """ES sort _geo_distance: the Q1 match set ordered by great-circle
    distance from the origin, nearest 25, distance returned as the sort
    value (km, 4dp)."""
    from mysql_es_spark.operators.geo import geo_distance_sort

    ix = _index_for_documents(spark, sf)
    out = geo_distance_sort(
        spark, ix, " ".join(BM25_Q1), _GEO_ORIGIN[0], _GEO_ORIGIN[1],
        size=25, cfg=_docs_index_cfg(), runtime_mappings=_GEO_RM,
    )
    # sorted_search returns (docid, doc_key, sort fields); doc_key is
    # "conv_id:turn_idx" with conv_id = the documents doc_id
    return out.select(
        F.split(F.col("doc_key"), ":").getItem(0).cast("long").alias("doc_id"),
        F.round("geo_dist_km", 4).alias("dist_km"),
    ).orderBy("doc_id")


def q_geo_tile_grid(spark, sf):
    """ES geotile_grid agg at zoom 4 over the Q1 match set: doc counts
    per web-mercator z/x/y tile, top 15 buckets (count desc, key asc) —
    closed-form tile math reproduced exactly by the SQL oracle."""
    from mysql_es_spark.operators.geo import geotile_grid

    ix = _index_for_documents(spark, sf)
    return geotile_grid(
        spark, ix, " ".join(BM25_Q1), precision=4, size=15,
        cfg=_docs_index_cfg(), runtime_mappings=_GEO_RM,
    )


def _geo_hav_sql(lat_sql: str, lon_sql: str) -> str:
    olat, olon = _GEO_ORIGIN
    return (
        f"2.0 * 6371.0088 * asin(sqrt("
        f"pow(sin((radians({lat_sql}) - radians({olat})) / 2), 2)"
        f" + cos(radians({olat})) * cos(radians({lat_sql}))"
        f" * pow(sin((radians({lon_sql}) - radians({olon})) / 2), 2)))"
    )


def _river_bm25_sql(terms: list[str], k: int, n_first: int) -> str:
    """BM25 over only the first ``n_first`` documents by doc_id — the
    oracle twin of q_river_jdbc_build's Derby-seeded corpus."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH base AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT {n_first}),
toks AS (SELECT doc_id, {TOK} AS tl FROM base),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ({tl})
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT {k}
"""


# Round-3 gate window (VERDICT r2 "Next round" #3): the driver records the
# FIRST 50 queries() entries only. Rounds 1+2 checked 100 distinct names, so
# this round rotates the window to entries never seen by any
# CORRECTNESS_r*.json — a handful of previously-green flagships stay as
# canaries, new round-3 entries join at the front, and the remainder is
# drawn (in registration order) from the 125 never-driver-checked
# oracle-backed entries. Names not in this list keep registration order
# behind it; unknown names are ignored, so the list is safe to edit.
_GATE_WINDOW_R3 = [
    # canaries (driver-green in r01/r02; re-checked every round)
    "bm25_via_index",
    "bm25_conjunctive",
    "bm25_phrase_via_index",
    "emb_cosine_topk",
    "bm25_update_by_query",
    "bm25_date_routed",
    # round-3 additions (registered below as they land)
    "esql_functions",
    "esql_grok",
    "eql_missing_sequence",
    "agg_variable_width_histogram_exact",
    "mm_feature_extract_hash",
    "mm_video_mjpeg_hash",
    "cdc_posting_merge",
    # never-driver-checked, oracle-backed (r1+r2 window never reached these)
    "bm25_exists",
    "doc_dedup_ingest",
    "doc_curation_pipeline",
    "match_aggs_runtime",
    "emb_semantic_dedup_exact",
    "bm25_match_export",
    "bm25_export_slice",
    "parent_id_children",
    "bm25_phrase_synonym",
    "agg_percentile_ranks",
    "agg_top_metrics",
    "agg_value_count",
    "agg_mad",
    "agg_boxplot",
    "agg_string_stats",
    "agg_categorize_text",
    "agg_frequent_item_sets",
    "agg_sampler_stats",
    "agg_random_sampler",
    "agg_bucket_correlation",
    "agg_change_point",
    "terms_lookup",
    "emb_knn_min_sim",
    "agg_percentiles_bucket",
    "agg_normalize",
    "agg_cumulative_cardinality",
    "bm25_rank_feature",
    "agg_matrix_stats",
    "agg_t_test",
    "agg_rate",
    "bm25_intervals",
    "bm25_intervals_filter",
    "agg_auto_date_histogram",
    "agg_scripted_metric",
    "agg_moving_percentiles",
    "bm25_search_after",
    "lm_dirichlet_topk",
    "bm25_delete_by_query",
    "bm25_purged_compact",
    "bm25_highlight",
    "agg_date_histogram",
    "agg_extended_stats",
    "agg_range",
    "agg_filters",
    "agg_cardinality",
    "agg_top_hits",
    "agg_significant_terms",
    "agg_significant_text",
    "bm25_via_compacted",
    "bm25_more_like_this",
    "withs_3hop",
    "doc_minhash_lsh_pairs",
    "doc_incremental_dedup",
    "doc_winnow_overlap",
    "doc_simhash_near_dups",
]


# Round-4 gate window (VERDICT r3 "Next round" #4 and #9): 6 canaries +
# the round-4 JDBC river entry + 43 entries never seen by any
# CORRECTNESS_r0{1,2,3}.json (drawn from the 89 oracle-backed remainder
# in registration order, with the three exact-config ANN anchors —
# emb_ivf_full_probe / emb_pq_rerank_exact / emb_bbq_hamming — promoted
# per item 9: each is the hash-green twin of a rows-only ANN family).
_GATE_WINDOW_R4 = [
    # canaries (driver-green in r01-r03; re-checked every round)
    "bm25_via_index",
    "bm25_conjunctive",
    "bm25_phrase_via_index",
    "emb_cosine_topk",
    "bm25_update_by_query",
    "bm25_date_routed",
    # round-4 addition
    "river_jdbc_build",
    # rows-only families' exact-config anchors (item 9)
    "emb_ivf_full_probe",
    "emb_pq_rerank_exact",
    "emb_bbq_hamming",
    # never-driver-checked, oracle-backed
    "doc_minhash_lsh_pairs",
    "doc_incremental_dedup",
    "doc_winnow_overlap",
    "doc_simhash_near_dups",
    "bm25_delete_by_query",
    "bm25_purged_compact",
    "bm25_highlight",
    "bm25_via_compacted",
    "bm25_more_like_this",
    "withs_3hop",
    "agg_date_histogram",
    "agg_extended_stats",
    "agg_range",
    "agg_filters",
    "agg_cardinality",
    "agg_top_hits",
    "agg_significant_terms",
    "agg_significant_text",
    "bm25_sorted_search",
    "bm25_runtime_sorted",
    "agg_date_range",
    "agg_multi_terms",
    "agg_rare_terms",
    "agg_adjacency_matrix",
    "agg_weighted_avg",
    "agg_bucket_sort",
    "agg_serial_diff",
    "agg_stats_bucket",
    "doc_gopher_quality",
    "doc_pii_scrub",
    "doc_pack_sequences",
    "doc_chunks",
    "doc_greedy_pack",
    "doc_quality_top_percent",
    "doc_stratified_sample",
    "doc_seeded_shuffle",
    "phrase_suggest",
    "hybrid_rrf",
    "eql_sequence",
    "esql_pipe",
]


# Round-5 gate window (VERDICT r4 "Next round" #1): finish end-to-end
# driver verification of the whole surface. 4 canaries (driver-green in
# r01-r04) + the round-5 river_cdc_feed + ALL 45 oracle-backed entries
# never seen by any CORRECTNESS_r0{1,2,3,4}.json (the set computed as
# queries() keys minus the union of those four files, restricted to
# oracle_sql() keys, in registration order) = exactly 50. After this
# round the only never-hash-checked entries are the 6 rows-only-by-design
# families (agg_variable_width_histogram, emb_ann_lsh/ivf/pq, mm_feature_
# extract, mm_frame_sample), each of which already has a hash-green
# exact-config twin in a prior driver file.
_GATE_WINDOW_R5 = [
    # canaries
    "bm25_via_index",
    "bm25_conjunctive",
    "emb_cosine_topk",
    "bm25_update_by_query",
    # round-5 addition: log-based CDC entry point
    "river_cdc_feed",
    # never-driver-checked, oracle-backed (all 45)
    "agg_sampler",
    "doc_ingest_pipeline",
    "doc_contamination",
    "agg_composite",
    "agg_composite_mixed",
    "agg_subaggs_tree",
    "agg_pipeline",
    "doc_decontaminate",
    "doc_epoch_mix",
    "doc_dsir_weights",
    "doc_dsir_sample",
    "doc_temperature_mix",
    "doc_dup_spans",
    "bm25_count",
    "doc_mget",
    "hybrid_knn_boost",
    "doc_dedup_keep_best",
    "bm25_explain",
    "term_suggest",
    "terms_enum",
    "eql_sample",
    "user_history_dedup",
    "events_percolate_filters",
    "transform_pivot",
    "esql_match",
    "esql_lookup_stats",
    "esql_fork",
    "esql_inlinestats",
    "esql_score",
    "events_downsample",
    "ltr_features",
    "graph_explore",
    "bm25_query_rules",
    "agg_percentiles",
    "bm25_synonyms",
    "bm25_index_synonyms",
    "bm25_span_near",
    "term_vectors",
    "mterm_vectors",
    "bm25_collapse",
    "bm25_collapse_inner_hits",
    "agg_children",
    "agg_parent",
    "hybrid_linear",
    "conv_rollup_topk",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registration order used to be the gate order; since round 3 the
    first-50 driver window is rotated explicitly per round (see
    ``_GATE_WINDOW_R5``) so every round driver-checks entries no prior
    CORRECTNESS_r*.json has seen."""
    q = {
        # --- flagship: full index build + query engine (SURVEY §2.9) ---
        "bm25_via_index": q_bm25_index,
        "bm25_sparse_vector": q_sparse_vector,
        "bm25_conjunctive": q_bm25_conjunctive,
        "bm25_phrase_via_index": q_phrase_via_index,
        "bm25_prefix_via_index": q_prefix_via_index,
        "emb_cosine_topk": q_emb_topk,
        "emb_sq_topk": q_emb_sq_topk,
        "emb_knn_filtered": q_emb_knn_filtered,
        "emb_near_dups": q_emb_near_dups,
        # --- round-2 features ---
        "bm25_ngram_phrase_via_index": q_ngram_phrase_via_index,
        "bm25_multi_match": q_multi_match,
        "bm25_cross_fields": q_cross_fields,
        "bm25_combined_fields": q_combined_fields,
        "bm25_phrase_prefix": q_phrase_prefix,
        "bm25_boosting": q_boosting,
        "doc_lm_quality": q_lm_quality,
        "doc_nb_classifier": q_nb_classifier,
        "doc_percolate": q_percolate,
        "doc_percolate_phrase": q_percolate_phrase,
        "cdc_posting_merge": q_cdc_posting_merge,
        "bm25_date_routed": q_bm25_date_routed,
        "bm25_date_routed_dfs": q_bm25_date_routed_dfs,
        "bm25_bool_query": q_bool_query,
        "bm25_fuzzy_query": q_fuzzy_query,
        "bm25_wildcard_query": q_wildcard_query,
        "bm25_regexp_query": q_regexp_query,
        "bm25_update_by_query": q_update_by_query,
        "bm25_has_parent": q_has_parent,
        "bm25_phrase_slop": q_phrase_slop,
        "bm25_filtered": q_bm25_filtered,
        "bm25_filtered_alias": q_bm25_filtered_alias,
        "match_aggs_by_lang": q_match_aggs,
        "bm25_query_string": q_bm25_query_string,
        "bm25_rescore": q_bm25_rescore,
        "bm25_function_score": q_bm25_function_score,
        "bm25_msearch": q_bm25_msearch,
        "bm25_hard_negatives": q_hard_negatives,
        "bm25_dis_max": q_bm25_dis_max,
        "bm25_rank_eval": q_bm25_rank_eval,
        "bm25_constant_score": q_constant_score,
        "bm25_distance_feature": q_distance_feature,
        "bm25_pinned": q_pinned,
        "bm25_match_bool_prefix": q_match_bool_prefix,
        "bm25_span_first": q_span_first,
        "bm25_terms_set": q_terms_set,
        "bm25_ids": q_ids,
        "bm25_simple_query_string": q_simple_query_string,
        "bm25_span_not": q_span_not,
        "agg_global": q_agg_global,
        "completion_suggest": q_completion_suggest,
        "bm25_min_score": q_min_score,
        "bm25_exists": q_exists,
        "doc_dedup_ingest": q_dedup_ingest,
        "doc_curation_pipeline": q_curation,
        "match_aggs_runtime": q_match_aggs_runtime,
        "emb_semantic_dedup_exact": q_semantic_dedup,
        "bm25_match_export": q_match_export,
        "bm25_export_slice": q_match_export_slice,
        "parent_id_children": q_parent_id,
        "bm25_phrase_synonym": q_phrase_synonym,
        "agg_percentile_ranks": q_agg_percentile_ranks,
        "agg_top_metrics": q_agg_top_metrics,
        "agg_value_count": q_agg_value_count,
        "agg_mad": q_agg_mad,
        "agg_boxplot": q_agg_boxplot,
        "agg_string_stats": q_agg_string_stats,
        "agg_categorize_text": q_agg_categorize,
        "agg_frequent_item_sets": q_agg_frequent_item_sets,
        "agg_sampler_stats": q_agg_sampler_stats,
        "agg_random_sampler": q_agg_random_sampler,
        "agg_bucket_correlation": q_agg_bucket_correlation,
        "agg_change_point": q_agg_change_point,
        "terms_lookup": q_terms_lookup,
        "emb_knn_min_sim": q_emb_knn_min_sim,
        "agg_percentiles_bucket": q_agg_percentiles_bucket,
        "agg_normalize": q_agg_normalize,
        "agg_cumulative_cardinality": q_agg_cumulative_cardinality,
        "bm25_rank_feature": q_bm25_rank_feature,
        "agg_matrix_stats": q_agg_matrix_stats,
        "agg_t_test": q_agg_t_test,
        "agg_rate": q_agg_rate,
        "bm25_intervals": q_bm25_intervals,
        "bm25_intervals_filter": q_intervals_filter,
        "agg_auto_date_histogram": q_agg_auto_date_histogram,
        "agg_scripted_metric": q_agg_scripted_metric,
        "agg_moving_percentiles": q_agg_moving_percentiles,
        "bm25_search_after": q_bm25_search_after,
        "lm_dirichlet_topk": q_lm_dirichlet,
        "bm25_delete_by_query": q_bm25_deleted,
        "bm25_purged_compact": q_bm25_purged,
        "bm25_highlight": q_bm25_highlight,
        "agg_date_histogram": q_agg_date_histogram,
        "agg_extended_stats": q_agg_extended_stats,
        "agg_range": q_agg_range,
        "agg_filters": q_agg_filters,
        "agg_cardinality": q_agg_cardinality,
        "agg_top_hits": q_agg_top_hits,
        "agg_significant_terms": q_agg_significant_terms,
        "agg_significant_text": q_agg_significant_text,
        "bm25_via_compacted": q_bm25_compacted,
        "bm25_more_like_this": q_more_like_this,
        "withs_3hop": q_withs_3hop,
        # --- round-3 ES|QL tail ---
        "esql_functions": q_esql_functions,
        "esql_grok": q_esql_grok,
        "eql_missing_sequence": q_eql_missing,
        # --- round-4 additions ---
        "river_jdbc_build": q_river_jdbc_build,
        # --- round-5 additions ---
        "river_cdc_feed": q_river_cdc_feed,
        "geo_distance_search": q_geo_distance_search,
        "geo_distance_sorted": q_geo_distance_sorted,
        "geo_tile_grid": q_geo_tile_grid,
        # --- round-1 hash fixes ---
        "a2_runlength_groups": q_a2,
        "sessionize": q_sessionize,
        # --- documents / training-data pipeline (round-2 tri-match dedup:
        # VERDICT item 7 requires driver rows, keep inside the window) ---
        "doc_minhash_lsh_pairs": q_minhash,
        "doc_incremental_dedup": q_incremental_dedup,
        "doc_winnow_overlap": q_winnow,
        "doc_simhash_near_dups": q_simhash,
        # --- below the driver gate's 50-entry window: r01-green entries,
        # rows-only designs, and extras locally oracle-checked ---
        "bm25_sorted_search": q_sorted_search,
        "bm25_runtime_sorted": q_runtime_sorted,
        "agg_date_range": q_agg_date_range,
        "agg_multi_terms": q_agg_multi_terms,
        "agg_rare_terms": q_agg_rare_terms,
        "agg_adjacency_matrix": q_agg_adjacency_matrix,
        "agg_weighted_avg": q_agg_weighted_avg,
        "agg_sampler": q_agg_sampler,
        "agg_bucket_sort": q_agg_bucket_sort,
        "agg_serial_diff": q_agg_serial_diff,
        "agg_stats_bucket": q_agg_stats_bucket,
        "doc_dedup_exact": q_dedup_exact,
        "doc_gopher_quality": q_gopher,
        "doc_pii_scrub": q_pii_scrub,
        "doc_pack_sequences": q_pack,
        "doc_chunks": q_doc_chunks,
        "doc_ingest_pipeline": q_doc_ingest,
        "doc_greedy_pack": q_greedy_pack,
        "doc_quality_top_percent": q_quality_top_percent,
        "doc_contamination": q_contamination,
        "doc_stratified_sample": q_doc_stratified,
        "doc_seeded_shuffle": q_seeded_shuffle,
        "agg_variable_width_histogram": q_agg_vwh,
        "agg_variable_width_histogram_exact": q_agg_vwh_exact,
        "agg_composite": q_agg_composite,
        "agg_composite_mixed": q_agg_composite_mixed,
        "agg_subaggs_tree": q_agg_tree,
        "agg_pipeline": q_agg_pipeline,
        "doc_decontaminate": q_decontaminate,
        "phrase_suggest": q_phrase_suggest,
        "doc_epoch_mix": q_epoch_mix,
        "doc_dsir_weights": q_dsir_weights,
        "doc_dsir_sample": q_dsir_sample,
        "doc_temperature_mix": q_temperature_mix,
        "doc_dup_spans": q_dup_spans,
        "bm25_count": q_bm25_count,
        "doc_mget": q_doc_mget,
        "hybrid_rrf": q_hybrid_rrf,
        "hybrid_knn_boost": q_hybrid_knn,
        "t1_edge_ngram_tokens": q_t1_edge_ngram,
        "doc_hash_split": q_hash_split,
        "doc_ngram_jaccard_pairs": q_jaccard,
        "doc_dedup_clusters": q_dedup_clusters,
        "doc_dedup_keep_best": q_dedup_keep_best,
        "doc_quality": q_quality,
        "doc_fingerprint": q_fp,
        "doc_prefix_search": q_prefix_search,
        "doc_phrase_search": q_phrase_search,
        "doc_term_freq_top20": q_term_freq,
        "doc_bpe_token_estimate": q_bpe_tokens,
        "doc_token_count": q_tok_count,
        "doc_lang_id": q_lang,
        # --- direct-scoring baselines (r01-green) ---
        "bm25_direct": q_bm25_direct,
        "bm25_direct_q2": q_bm25_direct2,
        "bm25_explain": q_bm25_explain,
        "term_suggest": q_term_suggest,
        "terms_enum": q_terms_enum,
        "eql_sequence": q_eql_sequence,
        "eql_sample": q_eql_sample,
        "user_history_dedup": q_user_history_dedup,
        "events_percolate_filters": q_events_percolate_filters,
        "esql_pipe": q_esql_pipe,
        "transform_pivot": q_transform_pivot,
        "esql_match": q_esql_match,
        "esql_lookup_stats": q_esql_lookup_stats,
        "esql_fork": q_esql_fork,
        "esql_inlinestats": q_esql_inlinestats,
        "esql_score": q_esql_score,
        "events_downsample": q_events_downsample,
        "ltr_features": q_ltr_features,
        "graph_explore": q_graph_explore,
        # registered below the driver's 50-entry window on purpose: the
        # flagship set there is curated; bbq is locally oracle-checked
        "emb_bbq_hamming": q_emb_bbq_hamming,
        "bm25_query_rules": q_bm25_query_rules,
        "agg_percentiles": q_agg_percentiles,
        "bm25_synonyms": q_bm25_synonyms,
        "bm25_index_synonyms": q_bm25_index_synonyms,
        "bm25_span_near": q_bm25_span_near,
        "term_vectors": q_term_vectors,
        "mterm_vectors": q_mterm_vectors,
        "bm25_collapse": q_bm25_collapse,
        "bm25_collapse_inner_hits": q_bm25_collapse_inner_hits,
        "agg_children": q_agg_children,
        "agg_parent": q_agg_parent,
        "hybrid_linear": q_hybrid_linear,
        "conv_rollup_topk": q_conv_topk,
        # --- ANN / multimodal (rows-only by design) ---
        "emb_ann_lsh_topk": q_ann,
        "emb_ann_ivf_topk": q_ivf,
        "emb_pq_topk": q_pq,
        "emb_ivf_full_probe": q_ivf_full_probe,
        "emb_pq_rerank_exact": q_pq_rerank_exact,
        "mm_feature_extract": q_mm_features,
        "mm_feature_extract_hash": q_mm_features_hash,
        "mm_video_mjpeg_hash": q_mm_video_mjpeg_hash,
        "mm_frame_sample": q_mm_frames,
        # --- joins / relations ---
        "j1_semi_join": q_j1,
        "j_anti_join": q_janti,
        "j3_left_outer_join": q_j3,
        "j4_multihop_join": q_j4,
        "j6_parent_propagation": q_j6,
        "asof_join_events_orders": q_asof,
        "range_join_attribution": q_range_join,
        # --- windows / aggregation ---
        "user_event_sequence": q_event_seq,
        "w1_last_writer_wins": q_w1,
        "w_running_total": q_running,
        "a1_counts_by_type": q_a1,
        "q1_pricing_summary": q_tpch_q1,
        "hourly_rollup": q_hourly,
        "region_revenue": q_region_rev,
        "quantiles_by_status": q_quantiles,
        "cube_count": q_cube,
        "rollup_qty": q_rollup,
        "pivot_status": q_pivot,
        # --- trivia tail (all green in CORRECTNESS_r01.json) ---
        "a3_distinct": q_a3,
        "o4_topk_orders": q_o4,
        "p1_projection_filter": q_p1,
        "p3_column_alias": q_p3,
        "p4_event_type_filter": q_p4,
        "p6_eq_predicate": q_p6,
        "p8_delete_null_mask": q_p8,
        "e1_intersect": q_e1,
        "e2_union": q_e2,
        "e3_except": q_e3,
        "f4_date_format": q_f4,
        "f5_concat_ws_id": q_f5,
        "f7_hex": q_f7,
        "f8_json_extract": q_f8,
        "f10_to_json": q_f10,
    }
    window = [n for n in _GATE_WINDOW_R5 if n in q]
    tail = [n for n in q if n not in set(window)]
    return {n: q[n] for n in (*window, *tail)}


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_STOP_EN = "'the','a','of','and','to','in','is','that','it','for'"
_STOP_ES = "'el','la','de','y','que','en','un','una','los','las'"
_STOP_FR = "'le','la','de','et','que','en','un','une','les','des'"



def _minhash_sql() -> str:
    """The DuckDB equivalent of q_minhash: same md5 base hash, the same
    64 (a, b) permutation constants inlined, wrap-mod-2^64 arithmetic via
    HUGEINT, band keys joined on the literal 4-value slices."""
    from mysql_es_spark.operators.dedup import _perm_params

    a, b = _perm_params(64, 42)
    perm_rows = ",".join(f"({j},{int(a[j])},{int(b[j])})" for j in range(64))
    return f"""
WITH t AS (SELECT doc_id, {TOK} AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id, u.s AS shingle
       FROM t, unnest([list_aggregate(toks[i:i+1], 'string_agg', ' ')
                       FOR i IN range(1, len(toks))]) AS u(s)
       WHERE len(toks) >= 2),
perms(j, a, b) AS (VALUES {perm_rows}),
hv AS (SELECT doc_id, shingle, md5_number_upper(shingle) AS h FROM sh),
sig AS (
  SELECT hv.doc_id, p.j,
         min(CAST((((CAST(p.a AS HUGEINT) * CAST(hv.h AS HUGEINT))
               % 18446744073709551616 + p.b) % 18446744073709551616)
               % 2305843009213693951 AS BIGINT)) AS v
  FROM hv CROSS JOIN perms p GROUP BY 1, 2
),
sigl AS (SELECT doc_id, list(v ORDER BY j) AS l FROM sig GROUP BY 1),
banded AS (
  SELECT doc_id, bb.b AS band_idx,
         array_to_string(l[4 * bb.b + 1 : 4 * bb.b + 4], ',') AS key
  FROM sigl, unnest(range(0, 16)) AS bb(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.key = b.key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n
  FROM cand c JOIN sh sa ON sa.doc_id = c.id_a
              JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, round(i.n / (za.sz + zb.sz - i.n), 4) AS jaccard
FROM inter i JOIN sizes za ON za.doc_id = i.id_a
             JOIN sizes zb ON zb.doc_id = i.id_b
WHERE round(i.n / (za.sz + zb.sz - i.n), 4) >= 0.15
"""



def _incremental_dedup_sql() -> str:
    """DuckDB twin of q_incremental_dedup: same md5 signatures and band
    keys for ALL docs, candidates = new (>=400) × earlier id sharing a
    band, verification = signature-overlap estimate (what the store
    actually compares — it holds no texts)."""
    from mysql_es_spark.operators.dedup import _perm_params

    a, b = _perm_params(64, 42)
    perm_rows = ",".join(f"({j},{int(a[j])},{int(b[j])})" for j in range(64))
    return f"""
WITH t AS (SELECT doc_id, {TOK} AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id, u.s AS shingle
       FROM t, unnest([list_aggregate(toks[i:i+1], 'string_agg', ' ')
                       FOR i IN range(1, len(toks))]) AS u(s)
       WHERE len(toks) >= 2),
perms(j, a, b) AS (VALUES {perm_rows}),
hv AS (SELECT doc_id, shingle, md5_number_upper(shingle) AS h FROM sh),
sig AS (
  SELECT hv.doc_id, p.j,
         min(CAST((((CAST(p.a AS HUGEINT) * CAST(hv.h AS HUGEINT))
               % 18446744073709551616 + p.b) % 18446744073709551616)
               % 2305843009213693951 AS BIGINT)) AS v
  FROM hv CROSS JOIN perms p GROUP BY 1, 2
),
sigl AS (SELECT doc_id, list(v ORDER BY j) AS l FROM sig GROUP BY 1),
banded AS (
  SELECT doc_id, bb.b AS band_idx,
         array_to_string(l[4 * bb.b + 1 : 4 * bb.b + 4], ',') AS key
  FROM sigl, unnest(range(0, 16)) AS bb(b)
),
cand AS (
  SELECT DISTINCT n.doc_id AS doc_id, o.doc_id AS dup_of
  FROM banded n JOIN banded o
    ON n.band_idx = o.band_idx AND n.key = o.key
   AND n.doc_id >= 400 AND o.doc_id < n.doc_id
),
est AS (
  SELECT c.doc_id, c.dup_of,
         sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / 64.0 AS e
  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_id
              JOIN sig sb ON sb.doc_id = c.dup_of AND sb.j = sa.j
  GROUP BY 1, 2
)
SELECT doc_id, dup_of, round(e, 4) AS est_jaccard FROM est WHERE e >= 0.15
"""


def oracle_sql() -> dict[str, str]:
    return {
        "esql_functions": """
            WITH e AS (
              SELECT *,
                CAST(user_id % 5 + 1 AS DOUBLE) AS w,
                EXTRACT(year FROM ts) AS yr,
                strftime(ts, '%Y-%m-%d') AS day,
                CAST(floor((epoch(ts) - epoch(TIMESTAMP '2020-01-01 00:00:00')) / 3600) AS BIGINT) AS hrs
              FROM events
              WHERE (user_id % 200) < 128 AND event_type LIKE 'c%'
            )
            SELECT day,
                   count(*) AS n,
                   round(sum(value * w) / sum(w), 4) AS wavg,
                   round(CASE WHEN count(*) = 1 THEN 0.0 ELSE stddev_pop(value) END, 4) AS sd,
                   min(hrs) AS hmin,
                   CAST(count(DISTINCT yr) AS BIGINT) AS ydist,
                   3 AS mvc_max,
                   round(max(value), 4) AS mvavg_max,
                   round(min(least(value, value * 2, 0.0)), 4) AS mvmin_min,
                   round(max(greatest(value, value * 2, 0.0)), 4) AS mvtop_max
            FROM e GROUP BY day ORDER BY day LIMIT 25
        """,
        "eql_missing_sequence": """
            WITH o AS (
              SELECT event_id, ts, user_id, event_type,
                     sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS ec
              FROM events
            ),
            b AS (
              SELECT *, ec - CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ec_excl
              FROM o
            ),
            m AS (
              SELECT p.user_id, max(v.ts) AS start_ts, p.ts AS end_ts,
                     p.event_id AS end_event_id
              FROM b p JOIN b v ON v.user_id = p.user_id
              WHERE p.event_type = 'purchase' AND v.event_type = 'view'
                AND (v.ts < p.ts OR (v.ts = p.ts AND v.event_id < p.event_id))
                AND v.ec = p.ec_excl
              GROUP BY p.user_id, p.ts, p.event_id
            )
            SELECT user_id, start_ts, end_ts,
                   date_diff('microseconds', start_ts, end_ts) AS span_us,
                   end_event_id
            FROM m
            WHERE date_diff('microseconds', start_ts, end_ts) <= 86400000000
            ORDER BY end_ts, end_event_id
            LIMIT 200
        """,
        "esql_grok": """
            SELECT CASE WHEN value > 50 THEN 'ERROR' ELSE 'INFO' END AS lvl,
                   event_type AS method,
                   count(*) AS n,
                   CAST(sum(event_id % 1000) AS BIGINT) AS b,
                   CAST(count(DISTINCT user_id % 200) AS BIGINT) AS cips,
                   CAST(count(DISTINCT user_id % 3) AS BIGINT) AS paths
            FROM events
            GROUP BY 1, 2 ORDER BY lvl, method LIMIT 30
        """,
        "p1_projection_filter": """
            SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            WHERE l_shipdate < timestamp '1996-01-01'
        """,
        "p4_event_type_filter": """
            SELECT event_id, event_type, user_id FROM events
            WHERE event_type IN ('click', 'view')
        """,
        "p6_eq_predicate": """
            SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000
        """,
        "p8_delete_null_mask": """
            SELECT event_id, event_type,
                   round(CASE WHEN event_type = 'error' THEN NULL ELSE value END, 2)
                     AS value_masked
            FROM events
        """,
        "j3_left_outer_join": """
            SELECT o_orderkey, c_name, c_mktsegment
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        """,
        "j4_multihop_join": """
            SELECT o_orderkey, c_name, n_name, r_name
            FROM orders
            LEFT JOIN customer ON o_custkey = c_custkey
            LEFT JOIN nation ON c_nationkey = n_nationkey
            LEFT JOIN region ON n_regionkey = r_regionkey
        """,
        "j1_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "j_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "j6_parent_propagation": """
            SELECT o_orderkey,
                   CASE WHEN o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
                        THEN 'URGENT-SYNC' ELSE o_orderpriority END AS o_orderpriority
            FROM orders
        """,
        "p3_column_alias": """
            SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment FROM customer
        """,
        "e1_intersect": """
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT s_nationkey AS nationkey FROM supplier
        """,
        "e3_except": """
            SELECT o_custkey AS custkey FROM orders
            EXCEPT
            SELECT user_id AS custkey FROM events
        """,
        "user_event_sequence": """
            SELECT user_id,
                   string_agg(event_type, ' ' ORDER BY ts, event_id) AS event_seq
            FROM events GROUP BY user_id
        """,
        "a1_counts_by_type": """
            SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
            FROM events GROUP BY event_type
        """,
        "a3_distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "a2_runlength_groups": """
            WITH x AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
              FROM events)
            SELECT user_id,
                   CAST(sum(CASE WHEN p IS NULL OR p <> event_type THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_runs,
                   count(*) AS n_events
            FROM x GROUP BY user_id
        """,
        "w1_last_writer_wins": """
            SELECT user_id, event_id, event_type FROM (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1
        """,
        "w_running_total": """
            SELECT o_orderkey, o_custkey,
                   round(sum(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
            FROM orders
        """,
        "sessionize": """
            WITH x AS (
              SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
              FROM events)
            SELECT user_id,
                   CAST(sum(CASE WHEN p IS NULL OR epoch(ts) - epoch(p) > 1800 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_sessions
            FROM x GROUP BY user_id
        """,
        "o4_topk_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15
        """,
        "e2_union": """
            SELECT s_name AS name FROM supplier UNION SELECT c_name AS name FROM customer
        """,
        "f4_date_format": """
            SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
            FROM orders GROUP BY 1
        """,
        "f5_concat_ws_id": """
            SELECT l_orderkey || ':' || l_linenumber AS doc_key, l_quantity FROM lineitem
        """,
        "f7_hex": "SELECT o_orderkey, to_hex(o_orderkey) AS key_hex FROM orders",
        "f8_json_extract": """
            SELECT event_id, json_extract_string(props, '$.k') AS k_val FROM events
        """,
        "f10_to_json": """
            SELECT o_orderkey,
                   to_json(struct_pack(id := o_orderkey, st := o_orderstatus))::varchar
                     AS doc_json
            FROM orders
        """,
        "cube_count": """
            SELECT l_returnflag, l_linestatus, count(*) AS n
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "rollup_qty": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "doc_bpe_token_estimate": r"""
            SELECT doc_id,
                   len(regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]|[^a-z0-9\s]'))
                     AS n_bpe_tokens
            FROM documents
        """,
        "pivot_status": """
            SELECT l_returnflag,
                   round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
                   round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
            FROM lineitem GROUP BY l_returnflag
        """,
        "hourly_rollup": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   count(*) AS n, round(sum(value), 2) AS total_value
            FROM events GROUP BY 1
        """,
        "region_revenue": """
            SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "doc_token_count": f"SELECT doc_id, len({TOK}) AS n_tokens FROM documents",
        "doc_lang_id": f"""
            WITH t AS (SELECT doc_id, {TOK} AS toks FROM documents),
            r AS (SELECT doc_id,
                   len(list_filter(toks, x -> x IN ({_STOP_EN}))) * 1.0 / greatest(len(toks), 1) AS r_en,
                   len(list_filter(toks, x -> x IN ({_STOP_ES}))) * 1.0 / greatest(len(toks), 1) AS r_es,
                   len(list_filter(toks, x -> x IN ({_STOP_FR}))) * 1.0 / greatest(len(toks), 1) AS r_fr
                  FROM t)
            SELECT doc_id,
                   CASE WHEN r_en >= r_es AND r_en >= r_fr AND r_en > 0 THEN 'en'
                        WHEN r_es >= r_fr AND r_es > 0 THEN 'es'
                        WHEN r_fr > 0 THEN 'fr'
                        ELSE 'und' END AS lang_pred
            FROM r
        """,
        "doc_quality": f"""
            WITH t AS (SELECT doc_id, text, {TOK} AS toks FROM documents)
            SELECT doc_id,
                   round(0.4 * least(1.0, len(toks) / 100.0)
                       + 0.4 * least(1.0, 3.0 * len(list_filter(toks, x -> x IN ({_STOP_EN})))
                                           * 1.0 / greatest(len(toks), 1))
                       + 0.2 * (1.0 - (length(text) - length(regexp_replace(text, '[^0-9a-zA-Z ]', '', 'g')))
                                      * 1.0 / greatest(length(text), 1)), 4) AS quality
            FROM t
        """,
        "doc_fingerprint": f"""
            SELECT doc_id, md5(array_to_string({TOK}, ' ')) AS fp FROM documents
        """,
        "doc_pack_sequences": packing.duckdb_pack_sequences(budget=512, n_shards=8),
        "doc_ingest_pipeline": """
SELECT doc_id, lower(regexp_replace(text, '[0-9]+', '#', 'g')) AS text,
       lang AS language, source, 'v1' AS pipeline
FROM documents WHERE source <> 'src3'
""",
        # per-lang quality percentile: rank by (quality desc, id asc),
        # keep rank <= ceil(0.4 * group size)
        "doc_quality_top_percent": f"""
WITH t AS (SELECT doc_id, lang, text, {TOK} AS toks FROM documents),
q AS (
  SELECT doc_id, lang,
         round(0.4 * least(1.0, len(toks) / 100.0)
             + 0.4 * least(1.0, 3.0 * len(list_filter(toks, x -> x IN ({_STOP_EN})))
                                 * 1.0 / greatest(len(toks), 1))
             + 0.2 * (1.0 - (length(text) - length(regexp_replace(text, '[^0-9a-zA-Z ]', '', 'g')))
                            * 1.0 / greatest(length(text), 1)), 4) AS quality
  FROM t
),
r AS (
  SELECT doc_id, lang, quality,
         row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id ASC) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM q
)
SELECT doc_id, lang, quality, CAST(rk AS INT) AS q_rank
FROM r WHERE rk <= ceil(0.4 * n)
""",
        # greedy doc-atomic packing: recursive CTE replays the same
        # fill-until-overflow recurrence per (lang, md5-shard) group
        "doc_greedy_pack": f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, lang, len({TOK}) AS nt,
         CAST((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 8) AS INT) AS shard
  FROM documents
),
ordered AS (
  SELECT *, row_number() OVER (PARTITION BY lang, shard ORDER BY doc_id) AS rn
  FROM toks
),
g AS (
  SELECT lang, shard, rn, doc_id, nt, 0 AS win, nt AS acc
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.lang, o.shard, o.rn, o.doc_id, o.nt,
         CASE WHEN g.acc + o.nt <= 256 THEN g.win ELSE g.win + 1 END,
         CASE WHEN g.acc + o.nt <= 256 THEN g.acc + o.nt ELSE o.nt END
  FROM g JOIN ordered o
    ON o.lang = g.lang AND o.shard = g.shard AND o.rn = g.rn + 1
)
SELECT doc_id, lang, shard, CAST(win AS INT) AS window_id,
       CAST(nt AS INT) AS n_tokens
FROM g
""",
        # overlapping 64-token windows at stride 48 (inclusive duckdb slices)
        "doc_chunks": f"""
WITH t AS (SELECT doc_id, {TOK} AS tl FROM documents),
st AS (
  SELECT doc_id, tl, u.i
  FROM t, unnest(range(0, CASE WHEN len(tl) = 0 THEN 0
       ELSE 1 + CAST(greatest(0, ceil((len(tl) - 64) / 48.0)) AS INT) END)) AS u(i)
)
SELECT doc_id, CAST(i AS INT) AS chunk_idx, CAST(i * 48 AS INT) AS start_tok,
       CAST(len(tl[i*48+1 : i*48+64]) AS INT) AS n_tokens,
       array_to_string(tl[i*48+1 : i*48+64], ' ') AS chunk_text
FROM st
""",
        "doc_contamination": f"""
            WITH t AS (SELECT doc_id, {TOK} AS toks FROM documents),
            sh AS (SELECT doc_id, unnest(list_distinct(
                     [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                      FOR i IN range(1, len(toks) - 1)])) AS shingle
                   FROM t WHERE len(toks) >= 3),
            probe AS (SELECT doc_id AS probe_id, shingle FROM sh WHERE doc_id % 97 = 0),
            corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0)
            SELECT corp.doc_id, probe.probe_id, count(*) AS n_shared
            FROM corp JOIN probe USING (shingle)
            GROUP BY 1, 2
        """,
        "doc_gopher_quality": f"""
            WITH t AS (
              SELECT doc_id, text, {TOK} AS toks,
                     list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines
              FROM documents
            ), m AS (
              SELECT doc_id, len(toks) AS n_tok,
                     coalesce(list_sum(list_transform(toks, x -> length(x))), 0) * 1.0
                       / greatest(len(toks), 1) AS mean_wl,
                     list_max(list_transform(list_distinct(toks),
                                             d -> len(list_filter(toks, x -> x = d)))) * 1.0
                       / greatest(len(toks), 1) AS top_frac,
                     (len(lines) - len(list_distinct(lines))) * 1.0
                       / greatest(len(lines), 1) AS dup_frac
              FROM t
            )
            SELECT doc_id, n_tok AS n_tokens,
                   round(mean_wl, 4) AS mean_word_len,
                   round(coalesce(top_frac, 0.0), 4) AS top_unigram_frac,
                   round(dup_frac, 4) AS dup_line_frac,
                   (n_tok >= 10 AND mean_wl >= 2 AND mean_wl <= 12
                    AND top_frac <= 0.2 AND dup_frac <= 0.3) AS keep
            FROM m
        """,
        "doc_pii_scrub": r"""
            WITH base AS (
              SELECT doc_id,
                     text || ' reach user' || CAST(doc_id AS VARCHAR) ||
                     '@mail.example.org from 192.168.' || CAST(doc_id % 256 AS VARCHAR) ||
                     '.9 or call +1 (555) 010-' || CAST(1000 + doc_id % 9000 AS VARCHAR) AS t0
              FROM documents
            ), s1 AS (
              SELECT doc_id,
                     len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                     regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
              FROM base
            ), s2 AS (
              SELECT doc_id, n_email,
                     len(regexp_extract_all(t1, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ip,
                     regexp_replace(t1, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS t2
              FROM s1
            ), s3 AS (
              SELECT doc_id, n_email, n_ip,
                     len(regexp_extract_all(t2, '\+?[0-9][0-9() -]{6,}[0-9]')) AS n_phone,
                     regexp_replace(t2, '\+?[0-9][0-9() -]{6,}[0-9]', '[PHONE]', 'g') AS t3
              FROM s2
            )
            SELECT doc_id, t3 AS scrubbed, n_email, n_ip, n_phone FROM s3
        """,
        "doc_term_freq_top20": f"""
            WITH t AS (SELECT doc_id, {TOK} AS toks FROM documents),
            e AS (SELECT t.doc_id, u.term FROM t, unnest(t.toks) AS u(term))
            SELECT term, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
            FROM e GROUP BY term ORDER BY n_occurrences DESC, term ASC LIMIT 20
        """,
        "withs_3hop": """
            SELECT o_orderkey,
                   c.c_name AS cust_name,
                   c.c_mktsegment AS cust_segment,
                   n.n_name AS nation_name,
                   r.r_name AS region_name
            FROM orders o
            LEFT JOIN (SELECT * FROM customer WHERE c_custkey < 1000) c
              ON o.o_custkey = c.c_custkey
            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
            LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        """,
        "range_join_attribution": """
            SELECT o_orderkey, count(*) AS n_fast_ships
            FROM orders JOIN lineitem
              ON l_orderkey = o_orderkey
             AND l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 30 DAY
            GROUP BY o_orderkey
        """,
        "quantiles_by_status": """
            SELECT o_orderstatus,
                   round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
                   round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
            FROM orders GROUP BY o_orderstatus
        """,
        "t1_edge_ngram_tokens": f"""
            WITH t AS (SELECT doc_id, {TOK} AS toks FROM documents)
            SELECT doc_id,
                   len(list_distinct(flatten(
                     [ CASE WHEN length(x) >= 2
                        THEN [ x[1:n] FOR n IN range(2, least(length(x), 25) + 1) ]
                        ELSE [x] END FOR x IN toks ]))) AS n_grams
            FROM t
        """,
        "doc_prefix_search": f"""
            WITH t AS (SELECT doc_id, {TOK} AS toks FROM documents)
            SELECT doc_id, len(list_filter(toks, x -> starts_with(x, 'sca'))) AS n_hits
            FROM t WHERE len(list_filter(toks, x -> starts_with(x, 'sca'))) > 0
        """,
        "doc_phrase_search": f"""
            WITH t AS (SELECT doc_id, {TOK} AS toks FROM documents)
            SELECT doc_id,
                   strpos(' ' || array_to_string(toks, ' ') || ' ',
                          ' row scan ')::BIGINT AS pos
            FROM t
            WHERE strpos(' ' || array_to_string(toks, ' ') || ' ',
                         ' row scan ') > 0
        """,
        "asof_join_events_orders": """
            WITH r AS (
              SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
                FROM orders) WHERE rn = 1)
            SELECT e.event_id, r.o_orderkey, round(r.o_totalprice, 2) AS o_totalprice
            FROM events e ASOF LEFT JOIN r
              ON e.user_id = r.o_custkey AND r.o_orderdate <= e.ts
        """,
        "doc_hash_split": """
            SELECT doc_id,
                   CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100 < 80
                        THEN 'train' ELSE 'test' END AS split
            FROM documents
        """,
        "doc_dedup_clusters": f"""
            WITH RECURSIVE
            t AS (SELECT doc_id, {TOK} AS toks FROM documents),
            sh AS (SELECT doc_id, unnest(list_distinct(
                     [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))])) AS shingle
                   FROM t WHERE len(toks) >= 2),
            -- max_shingle_df=128 fan-out guard (df over distinct texts;
            -- this table has no duplicated text, so == per-doc df)
            shc AS (SELECT * FROM sh WHERE shingle IN (
                      SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 128)),
            sz AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id_a, id_b
              FROM inter JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b
              WHERE round(i * 1.0 / (za.sz + zb.sz - i), 4) >= 0.15),
            edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            r AS (
              SELECT doc_id AS id, doc_id AS lbl FROM documents
              UNION
              SELECT e.src AS id, r.lbl FROM edges e JOIN r ON r.id = e.dst
            )
            SELECT id AS doc_id, min(lbl) AS cluster_id FROM r GROUP BY id
        """,
        "doc_dedup_keep_best": f"""
            WITH RECURSIVE
            t AS (SELECT doc_id, {TOK} AS toks FROM documents),
            sh AS (SELECT doc_id, unnest(list_distinct(
                     [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))])) AS shingle
                   FROM t WHERE len(toks) >= 2),
            -- max_shingle_df=128 fan-out guard (df over distinct texts;
            -- this table has no duplicated text, so == per-doc df)
            shc AS (SELECT * FROM sh WHERE shingle IN (
                      SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 128)),
            sz AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id_a, id_b
              FROM inter JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b
              WHERE round(i * 1.0 / (za.sz + zb.sz - i), 4) >= 0.15),
            edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            r AS (
              SELECT doc_id AS id, doc_id AS lbl FROM documents
              UNION
              SELECT e.src AS id, r.lbl FROM edges e JOIN r ON r.id = e.dst
            ),
            comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM r GROUP BY id),
            q AS (SELECT doc_id, len(toks) AS q FROM t),
            ranked AS (
              SELECT comp.doc_id, comp.cluster_id,
                     first_value(comp.doc_id) OVER (
                       PARTITION BY comp.cluster_id
                       ORDER BY q.q DESC, comp.doc_id ASC) AS winner
              FROM comp JOIN q USING (doc_id))
            SELECT doc_id, cluster_id, doc_id = winner AS kept
            FROM ranked ORDER BY doc_id
        """,
        "doc_dedup_exact": f"""
            SELECT doc_id, fp FROM (
              SELECT doc_id, md5(array_to_string({TOK}, ' ')) AS fp,
                     row_number() OVER (PARTITION BY md5(array_to_string({TOK}, ' '))
                                        ORDER BY doc_id ASC) AS rn
              FROM documents) WHERE rn = 1
        """,
        "doc_ngram_jaccard_pairs": f"""
            WITH t AS (SELECT doc_id, {TOK} AS toks FROM documents),
            sh AS (SELECT doc_id, unnest(list_distinct(
                     [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))])) AS shingle
                   FROM t WHERE len(toks) >= 2),
            -- max_shingle_df=128 fan-out guard (df over distinct texts;
            -- this table has no duplicated text, so == per-doc df)
            shc AS (SELECT * FROM sh WHERE shingle IN (
                      SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 128)),
            sz AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b, round(i * 1.0 / (za.sz + zb.sz - i), 4) AS jaccard
            FROM inter JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b
            WHERE round(i * 1.0 / (za.sz + zb.sz - i), 4) >= 0.15
        """,
        "doc_minhash_lsh_pairs": _minhash_sql(),
        "doc_incremental_dedup": _incremental_dedup_sql(),
        "doc_winnow_overlap": f"""
            WITH t AS (SELECT doc_id, {TOK} AS toks FROM documents),
            g AS (SELECT doc_id,
                    [ md5_number_upper(list_aggregate(toks[i:i+3], 'string_agg', ' '))
                      FOR i IN range(1, len(toks) - 2) ] AS kgs
                  FROM t WHERE len(toks) >= 4),
            w AS (SELECT doc_id,
                    CASE WHEN len(kgs) <= 4 THEN [list_min(kgs)]
                         ELSE [ list_min(kgs[i:i+3]) FOR i IN range(1, len(kgs) - 2) ]
                    END AS sels
                  FROM g),
            f AS (SELECT DISTINCT doc_id, fp FROM w, unnest(sels) AS u(fp)),
            fd AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 50),
            ff AS (SELECT f.doc_id, f.fp FROM f JOIN fd USING (fp))
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "doc_simhash_near_dups": f"""
            WITH t AS (SELECT doc_id, {TOK} AS toks FROM documents),
            e AS (SELECT doc_id, term FROM t, unnest(toks) AS u(term)),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM e GROUP BY 1, 2),
            th AS (SELECT doc_id, tf, md5_number_upper(term) AS h FROM tf),
            bv AS (SELECT doc_id, b,
                     sum(tf * (CASE WHEN ((h >> CAST(b AS UBIGINT)) & 1) = 1
                               THEN 1 ELSE -1 END)) AS v
                   FROM th, (SELECT unnest(range(64)) AS b) GROUP BY 1, 2),
            shu AS (SELECT doc_id,
                      sum(CASE WHEN v > 0 THEN (1::HUGEINT << CAST(b AS INTEGER))
                          ELSE 0::HUGEINT END) AS shh
                    FROM bv GROUP BY 1),
            sh AS (SELECT d.doc_id,
                     CAST(coalesce(s.shh -
                       CASE WHEN s.shh >= 9223372036854775808::HUGEINT
                            THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END,
                       0) AS BIGINT) AS sim
                   FROM documents d LEFT JOIN shu s ON d.doc_id = s.doc_id)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sim, b.sim)) <= 3
        """,
        "term_suggest": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
terms AS (
  SELECT u.term, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT doc_id, unnest(list_distinct(tl)) AS term FROM toks) u
  GROUP BY 1
),
inputs AS (SELECT unnest(['jin', 'prt', 'stram']) AS input_term),
ranked AS (
  SELECT i.input_term, t.term AS suggestion,
         CAST(levenshtein(t.term, i.input_term) AS INT) AS distance, t.df,
         row_number() OVER (
           PARTITION BY i.input_term
           ORDER BY levenshtein(t.term, i.input_term) ASC, t.df DESC, t.term ASC
         ) AS rk
  FROM inputs i JOIN terms t
    ON t.term <> i.input_term AND levenshtein(t.term, i.input_term) <= 2
)
SELECT input_term, suggestion, distance, df FROM ranked WHERE rk <= 5
""",
        "bm25_query_rules": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
org AS (
  SELECT doc_id, round(s, 4) AS score FROM scores
  WHERE doc_id NOT IN (42, 7, 3)
),
pinned(doc_id, score) AS (VALUES
  (42, CAST(1000000.0 AS DOUBLE)), (7, CAST(999999.0 AS DOUBLE))),
allr AS (SELECT * FROM pinned UNION ALL SELECT * FROM org)
SELECT CAST(doc_id AS BIGINT) AS doc_id, score FROM allr
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "graph_explore": f"""
WITH toks AS (SELECT doc_id, list_distinct({TOK}) AS tl FROM documents),
dt AS (SELECT doc_id, unnest(tl) AS term FROM toks),
nbg AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
bg AS (SELECT term, CAST(count(*) AS BIGINT) AS bg_df FROM dt GROUP BY 1),
m0 AS (SELECT DISTINCT doc_id FROM dt WHERE term IN ('spark', 'join', 'query')),
n0 AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM m0),
fg0 AS (SELECT term, CAST(count(*) AS BIGINT) AS fg_df
        FROM dt JOIN m0 USING (doc_id) GROUP BY 1),
s0 AS (
  SELECT fg0.term, fg_df, bg.bg_df,
         (fg_df / n0.n - bg_df / nbg.n) * ((fg_df / n0.n) / (bg_df / nbg.n)) AS jlh
  FROM fg0 JOIN bg ON bg.term = fg0.term CROSS JOIN n0 CROSS JOIN nbg
  WHERE fg_df >= 3 AND fg_df / n0.n > bg_df / nbg.n
  ORDER BY round(jlh, 9) DESC, fg0.term ASC LIMIT 4
),
m1 AS (
  SELECT DISTINCT doc_id FROM dt WHERE term IN (SELECT term FROM s0)
),
n1 AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM m1),
fg1 AS (SELECT term, CAST(count(*) AS BIGINT) AS fg_df
        FROM dt JOIN m1 USING (doc_id) GROUP BY 1),
s1 AS (
  SELECT fg1.term, fg_df, bg.bg_df,
         (fg_df / n1.n - bg_df / nbg.n) * ((fg_df / n1.n) / (bg_df / nbg.n)) AS jlh
  FROM fg1 JOIN bg ON bg.term = fg1.term CROSS JOIN n1 CROSS JOIN nbg
  WHERE fg_df >= 3 AND fg_df / n1.n > bg_df / nbg.n
    AND fg1.term NOT IN (SELECT term FROM s0)
  ORDER BY round(jlh, 9) DESC, fg1.term ASC LIMIT 4
)
SELECT term, 0 AS depth, fg_df, bg_df, round(jlh, 6) AS jlh FROM s0
UNION ALL
SELECT term, 1 AS depth, fg_df, bg_df, round(jlh, 6) AS jlh FROM s1
ORDER BY depth, term
""",
        "ltr_features": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
judg(qid, ext_id, label) AS (VALUES
  ('q1', 3, CAST(2.0 AS DOUBLE)), ('q1', 57, CAST(0.0 AS DOUBLE)),
  ('q1', 123, CAST(1.0 AS DOUBLE)), ('q1', 321, CAST(1.0 AS DOUBLE)),
  ('q1', 999999999, CAST(0.0 AS DOUBLE)),
  ('q2', 8, CAST(1.0 AS DOUBLE)), ('q2', 241, CAST(2.0 AS DOUBLE))),
qterms(qid, term) AS (VALUES
  ('q1', 'spark'), ('q1', 'join'), ('q1', 'query'),
  ('q2', 'window'), ('q2', 'agg'), ('q2', 'batch'), ('q2', 'scan')),
qlen AS (SELECT qid, CAST(count(*) AS BIGINT) AS query_len FROM qterms GROUP BY 1),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN (SELECT term FROM qterms)
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT q.qid, tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s,
         CAST(count(DISTINCT tf.term) AS BIGINT) AS matched
  FROM qterms q JOIN tf ON tf.term = q.term
  JOIN dfreq ON dfreq.term = tf.term
  JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1, 2
)
SELECT j.qid, CAST(j.ext_id AS BIGINT) AS ext_id, j.label,
       round(coalesce(s.s, 0), 4) AS bm25,
       coalesce(s.matched, 0) AS matched_terms,
       ql.query_len,
       CAST(d.dl AS BIGINT) AS dl
FROM judg j
LEFT JOIN scores s ON s.qid = j.qid AND s.doc_id = j.ext_id
LEFT JOIN dl d ON d.doc_id = j.ext_id
JOIN qlen ql ON ql.qid = j.qid
ORDER BY j.qid, j.ext_id
""",
        "events_downsample": """
SELECT event_type,
       date_trunc('day', ts) AS day_ts,
       round(min(value), 4) AS v_min,
       round(max(value), 4) AS v_max,
       round(sum(value), 4) AS v_sum,
       CAST(count(value) AS BIGINT) AS v_count
FROM events GROUP BY event_type, date_trunc('day', ts)
ORDER BY event_type, day_ts
""",
        "esql_score": _bm25_sql(BM25_Q1, 20),
        "esql_inlinestats": """
WITH w AS (
  SELECT lang, doc_id, n_chars,
         max(n_chars) OVER (PARTITION BY lang) AS mx
  FROM documents
)
SELECT lang, doc_id, n_chars FROM w WHERE n_chars = mx
ORDER BY lang NULLS LAST, doc_id
""",
        "esql_fork": """
SELECT 'fork1' AS _fork, CAST(count(*) AS BIGINT) AS n,
       max(n_chars) AS widest, CAST(NULL AS VARCHAR) AS source
FROM documents WHERE lang = 'en'
UNION ALL
SELECT * FROM (
  SELECT 'fork2' AS _fork, CAST(count(*) AS BIGINT) AS n,
         max(n_chars) AS widest, source
  FROM documents GROUP BY source ORDER BY source NULLS LAST LIMIT 3
)
ORDER BY _fork, source NULLS LAST
""",
        "esql_lookup_stats": """
WITH lk AS (SELECT lang, avg(n_chars) AS lang_avg FROM documents GROUP BY 1),
j AS (
  SELECT d.lang, d.source, d.n_chars, lk.lang_avg
  FROM documents d LEFT JOIN lk ON lk.lang = d.lang
)
SELECT lang, source,
       CAST(count(CASE WHEN n_chars > lang_avg THEN 1 END) AS BIGINT) AS n_above,
       CAST(count(*) AS BIGINT) AS total
FROM j GROUP BY lang, source
ORDER BY lang NULLS LAST, source NULLS LAST
""",
        "esql_match": f"""
WITH toks AS (SELECT doc_id, text, lang, source, {TOK} AS tl FROM documents),
m AS (
  SELECT DISTINCT toks.doc_id FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join')
)
SELECT d.doc_id, d.lang AS role, d.source AS tool,
       CAST(length(d.text) AS BIGINT) AS tlen
FROM documents d JOIN m USING (doc_id)
WHERE d.lang = 'en'
ORDER BY d.doc_id
""",
        "transform_pivot": """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS total,
       max(ts) AS last_ts,
       CAST(count(DISTINCT event_type) AS BIGINT) AS kinds
FROM events GROUP BY user_id ORDER BY user_id
""",
        "esql_pipe": """
WITH f AS (
  SELECT *, CAST(floor(n_chars / 100) AS INT) AS bucket FROM documents
  WHERE lang IN ('en', 'fr') OR n_chars > 400
)
SELECT lang, bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n_chars) AS BIGINT) AS total,
       max(n_chars) AS widest,
       CAST(median(n_chars) AS DOUBLE) AS med,
       CAST(count(DISTINCT source) AS BIGINT) AS nsrc
FROM f GROUP BY lang, bucket
ORDER BY lang NULLS LAST, bucket LIMIT 40
""",
        "events_percolate_filters": """
SELECT event_id, query_id FROM (
  SELECT event_id, 'big' AS query_id FROM events WHERE value >= 90
  UNION ALL
  SELECT event_id, 'errors' FROM events WHERE event_type = 'error'
  UNION ALL
  SELECT event_id, 'vip_mid' FROM events WHERE user_id < 5 AND value > 50
) ORDER BY event_id, query_id
""",
        "user_history_dedup": """
WITH fp AS (
  SELECT user_id,
         md5(string_agg(event_type, chr(31) ORDER BY ts, event_id)) AS fp,
         CAST(count(*) AS BIGINT) AS n_items
  FROM events GROUP BY user_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY user_id) AS rn FROM fp
)
SELECT user_id, fp, n_items FROM r WHERE rn = 1 ORDER BY user_id
""",
        "eql_sample": """
WITH ranked AS (
  SELECT user_id, event_type, event_id,
         row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS rn
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
firsts AS (SELECT user_id, event_type, event_id FROM ranked WHERE rn = 1)
SELECT v.user_id,
       v.event_id AS step1_event_id,
       c.event_id AS step2_event_id,
       p.event_id AS step3_event_id
FROM firsts v
JOIN firsts c ON c.user_id = v.user_id AND c.event_type = 'click'
JOIN firsts p ON p.user_id = v.user_id AND p.event_type = 'purchase'
WHERE v.event_type = 'view'
ORDER BY v.user_id
""",
        "eql_sequence": """
WITH ev AS (
  SELECT event_id, ts, user_id, event_type,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS seg
  FROM events
),
s1 AS (
  SELECT *, CASE WHEN event_type = 'view' THEN ts END AS st1 FROM ev
),
s2 AS (
  SELECT *, CASE WHEN event_type = 'click' THEN max(st1) OVER w END AS st2
  FROM s1 WINDOW w AS (
    PARTITION BY user_id, seg ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  )
),
s3 AS (
  SELECT *, CASE WHEN event_type = 'purchase' THEN max(st2) OVER w END AS st3
  FROM s2 WINDOW w AS (
    PARTITION BY user_id, seg ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  )
)
SELECT user_id, st3 AS start_ts, ts AS end_ts, event_id AS end_event_id
FROM s3
WHERE st3 IS NOT NULL
  AND epoch_us(ts) - epoch_us(st3) <= CAST(172800 AS BIGINT) * 1000000
ORDER BY user_id, end_event_id
""",
        "terms_enum": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
terms AS (
  SELECT u.term, CAST(count(*) AS BIGINT) AS doc_freq
  FROM (SELECT doc_id, unnest(list_distinct(tl)) AS term FROM toks) u
  GROUP BY 1
)
SELECT term, doc_freq FROM terms
WHERE term LIKE 's%' ORDER BY term LIMIT 6
""",
        "bm25_explain": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
top1 AS (SELECT doc_id FROM scores ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 1)
SELECT tf.term, tf.tf, dl.dl, dfreq.df,
       round(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5)), 6) AS idf,
       round(tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)), 6) AS tf_norm,
       round(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)), 6) AS contrib
FROM tf JOIN top1 USING (doc_id) JOIN dfreq USING (term) JOIN dl USING (doc_id)
CROSS JOIN stats
""",
        "conv_rollup_topk": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score, CAST(1 AS BIGINT) AS n_hits FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "bm25_collapse": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
winners AS (
  SELECT s.doc_id, round(s.s, 4) AS score, d.lang,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY round(s.s, 4) DESC, s.doc_id ASC) AS rk
  FROM scores s JOIN documents d USING (doc_id)
)
SELECT doc_id, score, lang FROM winners WHERE rk = 1
ORDER BY score DESC, doc_id ASC LIMIT 5
""",
        "term_vectors": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents WHERE doc_id = 42),
pos AS (
  SELECT u.term, u.p - 1 AS p
  FROM toks, (SELECT unnest(tl) AS term, generate_subscripts(tl, 1) AS p) u
)
SELECT term, CAST(count(*) AS BIGINT) AS tf,
       array_to_string(list(p ORDER BY p), ',') AS positions
FROM pos GROUP BY term ORDER BY term
""",
        "mterm_vectors": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents
              WHERE doc_id IN (7, 42, 123)),
pos AS (
  SELECT doc_id, u.term, u.p - 1 AS p
  FROM toks, (SELECT unnest(tl) AS term, generate_subscripts(tl, 1) AS p) u
)
SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
       array_to_string(list(p ORDER BY p), ',') AS positions
FROM pos GROUP BY doc_id, term ORDER BY doc_id, term
""",
        "bm25_span_near": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
pos AS (
  SELECT doc_id, u.term, u.p
  FROM toks, (SELECT unnest(tl) AS term, generate_subscripts(tl, 1) AS p) u
  WHERE u.term IN ('scan', 'row')
),
m AS (
  SELECT DISTINCT a.doc_id
  FROM pos a JOIN pos b
    ON a.doc_id = b.doc_id AND a.term = 'scan' AND b.term = 'row'
   AND abs(a.p - b.p) <= 3
),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('scan', 'row')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE tf.doc_id IN (SELECT doc_id FROM m)
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 40
""",
        "agg_percentiles": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id, len(tl) AS dl FROM toks
            WHERE list_has_any(tl, ['spark','join','query']))
SELECT unnest([0.25, 0.5, 0.9]) AS pct,
       round(unnest(CAST(quantile_cont(dl, [0.25, 0.5, 0.9]) AS DOUBLE[])), 6) AS value
FROM matched
""",
        "bm25_synonyms": f"""
WITH cmap(clause, term) AS (VALUES
  ('spark','spark'),('spark','stream'),
  ('join','join'),('join','merge'),
  ('query','query'),('query','filter')
),
toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN (SELECT term FROM cmap)
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT c.clause, tf.doc_id,
         ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS w
  FROM tf JOIN cmap c USING (term) JOIN dfreq USING (term)
          JOIN dl USING (doc_id) CROSS JOIN stats
),
best AS (SELECT clause, doc_id, max(w) AS w FROM contrib GROUP BY 1, 2),
scores AS (SELECT doc_id, sum(w) AS s FROM best GROUP BY 1)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "bm25_date_routed_dfs": f"""
WITH d AS (
  SELECT doc_id,
         strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
         {TOK} AS tl
  FROM documents
  WHERE (doc_id % 10) BETWEEN 2 AND 6
),
dl AS (SELECT doc_id, period, len(tl) AS dl FROM d),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT d.doc_id, d.period, u.term, count(*) AS tf
  FROM d, unnest(d.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id, tf.period,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1, 2
)
SELECT period, doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 25
""",
        # index-time synonyms: {{spark, stream}} behaves as ONE merged term
        # (tf sums both forms, df counts docs with either, dl unchanged)
        "bm25_index_synonyms": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'stream')
  GROUP BY 1
),
dfreq AS (SELECT count(*) AS df FROM tf),
scores AS (
  SELECT tf.doc_id,
         ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS s
  FROM tf CROSS JOIN dfreq JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "bm25_query_string": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
m AS (
  SELECT doc_id FROM toks
  WHERE list_contains(tl, 'spark')
    AND (list_contains(tl, 'join') OR list_contains(tl, 'merge'))
    AND NOT list_contains(tl, 'batch')
),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'merge')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE tf.doc_id IN (SELECT doc_id FROM m)
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "bm25_rescore": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
win AS (SELECT doc_id, s FROM scores ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 40),
ptf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('row', 'scan')
  GROUP BY 1, 2
),
pdf AS (SELECT term, count(*) AS df FROM ptf GROUP BY 1),
pscore AS (
  SELECT ptf.doc_id,
         sum( ln(1 + (stats.n - pdf.df + 0.5) / (pdf.df + 0.5))
              * ptf.tf / (ptf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS ps
  FROM ptf JOIN pdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE ptf.doc_id IN (
    SELECT doc_id FROM toks
    WHERE strpos(' ' || array_to_string(tl, ' ') || ' ', ' row scan ') > 0
  )
  GROUP BY 1
),
combined AS (
  SELECT w.doc_id,
         CASE WHEN p.ps IS NULL THEN w.s ELSE w.s + 2.0 * p.ps END AS s
  FROM win w LEFT JOIN pscore p USING (doc_id)
)
SELECT doc_id, round(s, 4) AS score FROM combined
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 15
""",
        "bm25_function_score": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
boosted AS (
  SELECT doc_id,
         s * pow(0.5, pow(abs(date_diff('day',
                 DATE '2026-01-01' + (doc_id % 10)::INT, DATE '2026-01-05')) / 3.0,
                 2.0)) AS s
  FROM scores
)
SELECT doc_id, round(s, 4) AS score FROM boosted
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "bm25_constant_score": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT toks.doc_id FROM toks, unnest(toks.tl) AS u(term)
      WHERE u.term IN ('spark', 'join', 'query') GROUP BY 1)
SELECT doc_id, CAST(1.5 AS DOUBLE) AS score FROM m ORDER BY doc_id ASC
""",
        "bm25_distance_feature": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('window', 'agg', 'batch', 'scan')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
boosted AS (
  SELECT doc_id,
         s + 2.0 * 3.0 / (3.0 + abs(date_diff('day',
                 DATE '2026-01-01' + (doc_id % 10)::INT, DATE '2026-01-05'))) AS s
  FROM scores
)
SELECT doc_id, round(s, 4) AS score FROM boosted
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 30
""",
        "bm25_pinned": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
pinned AS (
  SELECT d.doc_id, CAST(1000000 - p.i AS DOUBLE) AS s
  FROM (VALUES (42, 0), (7, 1), (99, 2)) AS p(id, i)
  JOIN documents d ON d.doc_id = p.id
),
organic AS (
  SELECT doc_id, s FROM scores
  WHERE doc_id NOT IN (SELECT doc_id FROM pinned)
),
allr AS (SELECT * FROM pinned UNION ALL SELECT * FROM organic)
SELECT doc_id, round(s, 4) AS score FROM allr
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "bm25_match_bool_prefix": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term = 'join' OR u.term LIKE 's%'
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
exp AS (SELECT term FROM dfreq WHERE term LIKE 's%'
        ORDER BY df DESC, term ASC LIMIT 50),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS c
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE tf.term = 'join' OR tf.term IN (SELECT term FROM exp)
),
scores AS (
  SELECT doc_id,
         coalesce(sum(c) FILTER (WHERE term = 'join'), 0)
       + coalesce(max(c) FILTER (WHERE term <> 'join'), 0) AS s
  FROM contrib GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores WHERE s > 0
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 30
""",
        "bm25_span_first": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
m AS (SELECT doc_id FROM toks WHERE list_position(tl, 'scan') BETWEEN 1 AND 3),
tf AS (
  SELECT toks.doc_id, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term = 'scan'
  GROUP BY 1
),
dfreq AS (SELECT count(*) AS df FROM tf),
scores AS (
  SELECT tf.doc_id,
         ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS s
  FROM tf JOIN dl USING (doc_id) CROSS JOIN dfreq CROSS JOIN stats
  WHERE tf.doc_id IN (SELECT doc_id FROM m)
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 30
""",
        "bm25_terms_set": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('window', 'agg', 'batch', 'scan')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s,
         count(*) AS nm
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
WHERE nm >= 1 + (doc_id % 3)
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 30
""",
        "bm25_ids": """
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM documents
WHERE doc_id IN (5, 17, 123, 999999)
ORDER BY doc_id ASC
""",
        "bm25_simple_query_string": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
m AS (
  SELECT doc_id FROM toks
  WHERE list_contains(tl, 'window')
     OR (list_contains(tl, 'agg') AND list_contains(tl, 'scan')
         AND NOT list_contains(tl, 'spark'))
),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('window', 'agg', 'scan')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE tf.doc_id IN (SELECT doc_id FROM m)
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "bm25_span_not": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
tokp AS (SELECT toks.doc_id, r.i AS pos, toks.tl[r.i] AS term
         FROM toks, unnest(range(1, len(toks.tl) + 1)) AS r(i)),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
a AS (SELECT doc_id, pos FROM tokp WHERE term = 'scan'),
b AS (SELECT doc_id, pos FROM tokp WHERE term = 'row'),
hits AS (
  SELECT a.doc_id, count(*) AS n_hits FROM a
  WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.doc_id = a.doc_id
                    AND b.pos BETWEEN a.pos - 1 AND a.pos)
  GROUP BY 1
),
tf AS (
  SELECT toks.doc_id, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term = 'scan'
  GROUP BY 1
),
dfreq AS (SELECT count(*) AS df FROM tf),
scores AS (
  SELECT tf.doc_id,
         ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS s
  FROM tf JOIN dl USING (doc_id) CROSS JOIN dfreq CROSS JOIN stats
)
SELECT hits.doc_id, hits.n_hits, round(scores.s, 4) AS score
FROM hits JOIN scores ON hits.doc_id = scores.doc_id
ORDER BY round(scores.s, 4) DESC, hits.doc_id ASC LIMIT 30
""",
        "agg_global": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
m AS (SELECT toks.doc_id FROM toks, unnest(toks.tl) AS u(term)
      WHERE u.term IN ('spark', 'join', 'query') GROUP BY 1),
md AS (SELECT count(*) AS n_matched, round(avg(dl), 4) AS avg_dl_matched
       FROM dl WHERE doc_id IN (SELECT doc_id FROM m)),
td AS (SELECT count(*) AS n_total, round(avg(dl), 4) AS avg_dl_total FROM dl)
SELECT md.n_matched, md.avg_dl_matched, td.n_total, td.avg_dl_total
FROM md CROSS JOIN td
""",
        "completion_suggest": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
terms AS (
  SELECT u.term, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT doc_id, unnest(list_distinct(tl)) AS term FROM toks) u
  GROUP BY 1
)
SELECT term AS suggestion, df AS weight FROM terms
WHERE term LIKE 's%'
ORDER BY weight DESC, suggestion ASC LIMIT 6
""",
        "bm25_min_score": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores WHERE s >= 0.35
ORDER BY round(s, 4) DESC, doc_id ASC
""",
        "bm25_exists": """
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM documents
ORDER BY doc_id ASC
""",
        # sort-by-field + search_after: page 2 (rows 41..80) of the match
        # set ordered by (lang asc, ts desc, conv_id-lexicographic asc)
        "bm25_sorted_search": f"""
WITH toks AS (SELECT doc_id, lang, {TOK} AS tl FROM documents),
m AS (
  SELECT DISTINCT toks.doc_id FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
),
f AS (
  SELECT d.doc_id, d.lang,
         CAST(DATE '2026-01-01' + (d.doc_id % 10) * INTERVAL 1 DAY AS TIMESTAMP) AS ts
  FROM documents d JOIN m USING (doc_id)
),
r AS (
  SELECT *, row_number() OVER (
    ORDER BY lang ASC, ts DESC, CAST(doc_id AS VARCHAR) ASC
  ) AS rn FROM f
)
SELECT doc_id, lang, ts FROM r WHERE rn > 40 AND rn <= 80 ORDER BY doc_id
""",
        "bm25_runtime_sorted": f"""
WITH toks AS (SELECT doc_id, text, {TOK} AS tl FROM documents),
m AS (
  SELECT DISTINCT toks.doc_id FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
),
f AS (
  SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS tlen
  FROM documents d JOIN m USING (doc_id)
),
r AS (
  SELECT *, row_number() OVER (
    ORDER BY tlen DESC, CAST(doc_id AS VARCHAR) ASC
  ) AS rn FROM f
)
SELECT doc_id, tlen FROM r WHERE rn <= 40 ORDER BY doc_id
""",
        "doc_dedup_ingest": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
fp AS (
  SELECT doc_id, md5(array_to_string(tl, ' ')) AS fp,
         CASE WHEN doc_id < 250 THEN 0 ELSE 1 END AS batch,
         doc_id::VARCHAR || ':0' AS doc_key
  FROM toks
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY fp ORDER BY batch ASC, doc_key ASC) AS rn
  FROM fp
)
SELECT doc_id FROM ranked WHERE rn = 1 ORDER BY doc_id
""",
        "doc_curation_pipeline": f"""
WITH t AS (
  SELECT doc_id, lang, text, {TOK} AS toks,
         list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines
  FROM documents WHERE lang IN ('en', 'es')
),
m AS (
  SELECT doc_id, lang, toks, len(toks) AS n_tok,
         coalesce(list_sum(list_transform(toks, x -> length(x))), 0) * 1.0
           / greatest(len(toks), 1) AS mean_wl,
         list_max(list_transform(list_distinct(toks),
                                 d -> len(list_filter(toks, x -> x = d)))) * 1.0
           / greatest(len(toks), 1) AS top_frac,
         (len(lines) - len(list_distinct(lines))) * 1.0
           / greatest(len(lines), 1) AS dup_frac
  FROM t
),
kept AS (
  SELECT doc_id, lang, toks, n_tok FROM m
  WHERE n_tok >= 10 AND mean_wl >= 2 AND mean_wl <= 12
    AND top_frac <= 0.2 AND dup_frac <= 0.3
),
winners AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (
      PARTITION BY md5(array_to_string(toks, ' ')) ORDER BY doc_id ASC) AS rn
    FROM kept
  ) WHERE rn = 1
)
SELECT k.doc_id, k.lang, k.n_tok AS n_tokens,
       CASE WHEN ('0x' || substr(md5(k.doc_id::VARCHAR), 1, 8))::UBIGINT % 100 < 80
            THEN 'train' ELSE 'test' END AS split
FROM kept k JOIN winners USING (doc_id)
ORDER BY k.doc_id
""",
        "match_aggs_runtime": f"""
WITH toks AS (SELECT doc_id, text, {TOK} AS tl FROM documents),
m AS (SELECT toks.doc_id FROM toks, unnest(toks.tl) AS u(term)
      WHERE u.term IN ('spark', 'join', 'query') GROUP BY 1),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks)
SELECT CAST(floor(length(t.text) / 200) * 200 AS BIGINT)::VARCHAR AS len_bucket,
       count(*) AS n_docs, round(avg(dl.dl), 4) AS avg_dl
FROM toks t JOIN dl USING (doc_id)
WHERE t.doc_id IN (SELECT doc_id FROM m)
GROUP BY 1 ORDER BY 1
""",
        "emb_semantic_dedup_exact": """
WITH RECURSIVE
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
r AS (
  SELECT vec_id AS id, vec_id AS lbl FROM embeddings
  UNION
  SELECT e.src AS id, r.lbl FROM edges e JOIN r ON r.id = e.dst
)
SELECT id AS vec_id, min(lbl) AS cluster, (id = min(lbl)) AS keep
FROM r GROUP BY id ORDER BY id
""",
        "bm25_match_export": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores ORDER BY doc_id ASC
""",
        # sliced export: slice 1 of 3 by md5(doc_id) of the full match set
        "bm25_export_slice": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
WHERE (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 3) = 1
ORDER BY doc_id ASC
""",
        # parent_id: all children of conv '42' at the boost score
        "parent_id_children": """
SELECT doc_id, 0 AS turn_idx, CAST(1.5 AS DOUBLE) AS score
FROM documents WHERE doc_id = 42
""",
        "bm25_phrase_synonym": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
tokp AS (SELECT toks.doc_id, r.i AS pos, toks.tl[r.i] AS term
         FROM toks, unnest(range(1, len(toks.tl) + 1)) AS r(i)),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
m AS (
  SELECT a.doc_id, count(*) AS n_hits
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'row' AND b.term IN ('merge', 'window')
  GROUP BY 1
),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('row', 'merge', 'window')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS c
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
),
sc AS (
  SELECT doc_id,
         coalesce(max(c) FILTER (WHERE term = 'row'), 0)
       + coalesce(max(c) FILTER (WHERE term IN ('merge', 'window')), 0) AS s
  FROM contrib GROUP BY 1
)
SELECT m.doc_id, m.n_hits, round(sc.s, 4) AS score
FROM m JOIN sc USING (doc_id)
ORDER BY round(sc.s, 4) DESC, m.doc_id ASC LIMIT 40
""",
        "agg_variable_width_histogram_exact": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT toks.doc_id FROM toks, unnest(toks.tl) AS u(term)
      WHERE u.term IN ('spark', 'join', 'query') GROUP BY 1),
dl AS (SELECT toks.doc_id, len(tl) AS dl FROM toks JOIN m USING (doc_id))
SELECT 'merge_all' AS cfg, round(avg(dl * 1.0), 4) AS key,
       min(dl) AS min_dl, max(dl) AS max_dl, count(*) AS n_docs
FROM dl
UNION ALL
SELECT 'no_merge' AS cfg, round(dl * 1.0, 4) AS key,
       dl AS min_dl, dl AS max_dl, count(*) AS n_docs
FROM dl GROUP BY dl
ORDER BY cfg, min_dl
""",
        "mm_video_mjpeg_hash": """
SELECT CAST(media_id AS BIGINT) AS media_id, kind,
       CAST(n_bytes AS BIGINT) AS n_bytes, feat_hash
FROM (VALUES
(0, 'image', 8796, '043c8d42d6802f749f619fab2d499929'),
(1, 'audio', 9644, '4e0a0e4205246a82c6ea65d9994eaba7'),
(2, 'video', 22252, '5d4c3e9444088ffebd0f55707702ad0c'),
(3, 'image', 54987, '57cfdec80f89f3def930c129dfb88b39'),
(4, 'audio', 19244, 'bffc93e1e60c21ebb22f1944714be713'),
(5, 'video', 17659, '95ba99e78cef3f14dd68569f207e41c3'),
(6, 'image', 36878, '6252757795a6e23a53c7177a87b44787'),
(7, 'audio', 28844, 'b579ced7ac7d8c902badb19367177c3b'),
(8, 'video', 13172, 'dd153fd04854ded132ad892b955cfc33'),
(9, 'image', 19855, '84448d4bef3d087eb8d402243eb83b00'),
(10, 'audio', 38444, '21745eba4a6b14aca0dc2b433e83d29a'),
(11, 'video', 26543, 'f3bd53a83d196151d32b426b3a8e39f6')
) AS t(media_id, kind, n_bytes, feat_hash)
ORDER BY media_id
""",
        "mm_feature_extract_hash": """
SELECT CAST(media_id AS BIGINT) AS media_id, kind,
       CAST(n_bytes AS BIGINT) AS n_bytes, feat_hash
FROM (VALUES
(0, 'image', 8796, '043c8d42d6802f749f619fab2d499929'),
(1, 'audio', 9644, '4e0a0e4205246a82c6ea65d9994eaba7'),
(2, 'video', 192, 'da5691d38e2cb376358faf4513cab565'),
(3, 'image', 54987, '57cfdec80f89f3def930c129dfb88b39'),
(4, 'audio', 19244, 'bffc93e1e60c21ebb22f1944714be713'),
(5, 'video', 288, '4ce37205ad97bec8f4ba566588f62d38'),
(6, 'image', 36878, '6252757795a6e23a53c7177a87b44787'),
(7, 'audio', 28844, 'b579ced7ac7d8c902badb19367177c3b'),
(8, 'video', 128, '539258a0f80fb9a8e17efe74c66287d9'),
(9, 'image', 19855, '84448d4bef3d087eb8d402243eb83b00'),
(10, 'audio', 38444, '21745eba4a6b14aca0dc2b433e83d29a'),
(11, 'video', 224, '33cb00463fb0fc58cd9582b68b90b9e4'),
(12, 'image', 8803, 'ec9e9eaa434f0856b8ce86f1a702ca77'),
(13, 'audio', 48044, '42d4793c37992a9de0356fd72f416ca9'),
(14, 'video', 320, '61fc5c248e1f64d10f02e6761fc30d18'),
(15, 'image', 57615, '25bcaf1ecfd88f4184488dcf886615c4'),
(16, 'audio', 57644, 'eac4bb7944708cb180eaed23ba0f7442'),
(17, 'video', 160, 'c5a291065847e45e88d1e63d7422ddb3'),
(18, 'image', 35186, 'be8306e3d865ad0c781a1d60d3b0aa60'),
(19, 'audio', 67244, 'b1275b5c1a16df54a7a28e14d622fc91'),
(20, 'video', 256, '44101272449bd7049998b9376c497132'),
(21, 'image', 19859, '6473e14031ecf3cf083bfca33387e51e'),
(22, 'audio', 76844, '1452a25dbb19f8b992f6ee2077e35342'),
(23, 'video', 352, 'd5456fb1eb3b34827699194b29f7405c'),
(24, 'image', 9229, '0e37ae327ca800e641213faa5588c419'),
(25, 'audio', 86444, '2891cf43f7e50779ffb2dc7fe5ca915a'),
(26, 'video', 192, '77cc928f69a452afbac3312111cc26a0'),
(27, 'image', 55030, 'e66774582e9eb90c4d9f918feab654c2'),
(28, 'audio', 96044, '5efea852f66db14b8ed8a7b64e765f15'),
(29, 'video', 288, '49b6f265197ff26abab875aeda4ee34a'),
(30, 'image', 35180, '219bbb8ea6b4ad33028e7541383d0553'),
(31, 'audio', 9644, '72780c724d8c0bfcfce03ea694d7ed78'),
(32, 'video', 128, '894ccf86bf6ae751f357894bcd384cf2'),
(33, 'image', 20749, '9c6f253f521c34f83bf261d40bd1537c'),
(34, 'audio', 19244, 'ae2ed5b7b8f8de5a32e7ae39ffe165c7'),
(35, 'video', 224, '59801657d57484de29ffa3d8864ef1e7'),
(36, 'image', 8805, '281f428d564142c10db37cbb988d9cbb'),
(37, 'audio', 28844, '44d2673f9d418e1f947267e153b34f77'),
(38, 'video', 320, '01b0703d39805396c3bb93f493f66288'),
(39, 'image', 54958, '2cafa224026014f97b4f70a576d7ff7c'),
(40, 'audio', 38444, '171cbca919dcdbc5a2d726ad7779ec93'),
(41, 'video', 160, '51e9e39961a9b0d6f5b01066b7780b22'),
(42, 'image', 36878, 'a6243eeedcf7c61de2fd25422dd2b944'),
(43, 'audio', 48044, 'dd5b0dae932becce4655810042514e64'),
(44, 'video', 256, '8b6bdb9bce8bdeff16402608cd756c7d'),
(45, 'image', 19845, '53ec0bdf90aa7f229e5fb5d71db75023'),
(46, 'audio', 57644, '521b090c575510c070a95c3aafceb61f'),
(47, 'video', 352, '437bc854e2e8f7d8146c1d5341ea9929')
) AS t(media_id, kind, n_bytes, feat_hash)
ORDER BY media_id
""",
        "agg_percentile_ranks": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT toks.doc_id FROM toks, unnest(toks.tl) AS u(term)
      WHERE u.term IN ('spark', 'join', 'query') GROUP BY 1),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks WHERE doc_id IN (SELECT doc_id FROM m)),
vals AS (SELECT unnest([5.0, 8.0, 12.0]) AS value)
SELECT v.value,
       round(100.0 * (SELECT count(*) FROM dl WHERE dl.dl <= v.value)
             / (SELECT count(*) FROM dl), 4) AS pct
FROM vals v ORDER BY v.value
""",
        "agg_top_metrics": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT toks.doc_id FROM toks, unnest(toks.tl) AS u(term)
      WHERE u.term IN ('spark', 'join', 'query') GROUP BY 1),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks)
SELECT m.doc_id, dl.dl
FROM m JOIN dl USING (doc_id)
ORDER BY m.doc_id::VARCHAR DESC LIMIT 1
""",
        "agg_value_count": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query']))
SELECT 'tool' AS field, CAST(count(d.source) AS BIGINT) AS n_values
FROM matched m JOIN documents d USING (doc_id)
""",
        "agg_mad": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT len(tl) AS dl FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
med AS (SELECT quantile_cont(dl, 0.5) AS med FROM m)
SELECT round(quantile_cont(abs(m.dl - med.med), 0.5), 4) AS mad
FROM m, med
""",
        "agg_boxplot": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT len(tl) AS dl FROM toks WHERE list_has_any(tl, ['spark','join','query']))
SELECT CAST(min(dl) AS BIGINT) AS min_dl,
       round(quantile_cont(dl, 0.25), 4) AS q1,
       round(quantile_cont(dl, 0.50), 4) AS q2,
       round(quantile_cont(dl, 0.75), 4) AS q3,
       CAST(max(dl) AS BIGINT) AS max_dl
FROM m
""",
        "agg_string_stats": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
tx AS (SELECT d.text AS text FROM m JOIN documents d USING (doc_id)),
ch AS (SELECT u.ch AS ch, count(*) AS c
       FROM tx, unnest(string_split(tx.text, '')) AS u(ch)
       WHERE u.ch <> '' GROUP BY 1),
ln AS (SELECT CAST(count(*) AS BIGINT) AS n_values,
              CAST(min(length(text)) AS INT) AS min_len,
              CAST(max(length(text)) AS INT) AS max_len,
              round(avg(length(text)), 4) AS avg_len
       FROM tx),
e AS (SELECT round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy FROM ch)
SELECT ln.*, e.entropy FROM ln, e
""",
        "agg_frequent_item_sets": """
WITH t AS (SELECT DISTINCT user_id AS txn, event_type AS item
           FROM events WHERE event_type IS NOT NULL),
n AS (SELECT count(DISTINCT txn) AS n FROM t),
s1 AS (SELECT item AS itemset, 1 AS set_size, count(*) AS doc_count FROM t GROUP BY 1),
s2 AS (SELECT a.item || ' ' || b.item AS itemset, 2 AS set_size, count(*) AS doc_count
       FROM t a JOIN t b ON a.txn = b.txn AND a.item < b.item GROUP BY 1),
u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
SELECT itemset, CAST(set_size AS INT) AS set_size,
       CAST(doc_count AS BIGINT) AS doc_count,
       round(doc_count * 1.0 / n.n, 4) AS support
FROM u, n WHERE doc_count * 1.0 / n.n >= 0.2
ORDER BY doc_count DESC, itemset ASC LIMIT 10
""",
        "agg_categorize_text": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
cat AS (
  SELECT array_to_string(
           list_slice(
             list_filter(string_split_regex(lower(d.text), '[^0-9a-z]+'),
                         x -> x <> '' AND NOT regexp_matches(x, '[0-9]')),
             1, 4), ' ') AS category
  FROM m JOIN documents d USING (doc_id)
)
SELECT category, CAST(count(*) AS BIGINT) AS doc_count
FROM cat WHERE category <> ''
GROUP BY 1 ORDER BY doc_count DESC, category ASC LIMIT 12
""",
        "agg_sampler_stats": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark','join','query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
top AS (SELECT doc_id FROM scores ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(dl.dl) AS BIGINT) AS min_dl,
       CAST(max(dl.dl) AS BIGINT) AS max_dl,
       round(avg(dl.dl), 4) AS avg_dl
FROM top JOIN dl USING (doc_id)
""",
        "agg_percentiles_bucket": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
hist AS (SELECT strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
                count(*) AS n_docs
         FROM matched GROUP BY 1),
q AS (SELECT quantile_cont(n_docs, [0.25, 0.50, 0.90]) AS qs FROM hist)
SELECT p.pct, round(q.qs[p.i], 4) AS value
FROM q, (VALUES (25.0, 1), (50.0, 2), (90.0, 3)) AS p(pct, i)
ORDER BY p.pct
""",
        "agg_normalize": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
hist AS (SELECT strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM matched GROUP BY 1)
SELECT period, n_docs,
       round(n_docs / (SELECT sum(n_docs) FROM hist) * 100.0, 4) AS value
FROM hist ORDER BY period
""",
        "agg_cumulative_cardinality": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
m AS (SELECT d.doc_id,
             strftime(DATE '2026-01-01' + (d.doc_id % 10)::INT, '%Y-%m-%d') AS period,
             d.source
      FROM matched JOIN documents d USING (doc_id)),
hist AS (SELECT period, CAST(count(*) AS BIGINT) AS n_docs FROM m GROUP BY 1),
firsts AS (SELECT min(period) AS period, source FROM m
           WHERE source IS NOT NULL GROUP BY source),
newv AS (SELECT period, count(*) AS new_values FROM firsts GROUP BY 1)
SELECT h.period, h.n_docs,
       CAST(sum(coalesce(n.new_values, 0))
            OVER (ORDER BY h.period) AS BIGINT) AS cum_unique
FROM hist h LEFT JOIN newv n USING (period)
ORDER BY h.period
""",
        "bm25_rank_feature": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
boosted AS (
  SELECT s.doc_id,
         s.s + 2.0 * length(d.text) / (length(d.text) + 200.0) AS s
  FROM scores s JOIN documents d USING (doc_id)
)
SELECT doc_id, round(s, 4) AS score FROM boosted
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 25
""",
        "agg_matrix_stats": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT toks.doc_id, len(tl)::DOUBLE AS x, length(d.text)::DOUBLE AS y
      FROM toks JOIN documents d USING (doc_id)
      WHERE list_has_any(tl, ['spark','join','query'])),
s AS (SELECT count(*)::DOUBLE AS n,
             sum(x) AS sx1, sum(x*x) AS sx2, sum(x*x*x) AS sx3, sum(x*x*x*x) AS sx4,
             sum(y) AS sy1, sum(y*y) AS sy2, sum(y*y*y) AS sy3, sum(y*y*y*y) AS sy4,
             sum(x*y) AS sxy
      FROM m),
mo AS (SELECT n,
              sx1/n AS mx, sx2/n - (sx1/n)^2 AS vx,
              sx3/n - 3*(sx1/n)*(sx2/n) + 2*(sx1/n)^3 AS m3x,
              sx4/n - 4*(sx1/n)*(sx3/n) + 6*(sx1/n)^2*(sx2/n) - 3*(sx1/n)^4 AS m4x,
              sy1/n AS my, sy2/n - (sy1/n)^2 AS vy,
              sy3/n - 3*(sy1/n)*(sy2/n) + 2*(sy1/n)^3 AS m3y,
              sy4/n - 4*(sy1/n)*(sy3/n) + 6*(sy1/n)^2*(sy2/n) - 3*(sy1/n)^4 AS m4y,
              sxy/n - (sx1/n)*(sy1/n) AS cxy
       FROM s)
SELECT CAST(n AS BIGINT) AS n,
       round(mx, 4) AS mean_x, round(vx, 4) AS var_x,
       round(m3x / vx^1.5, 4) AS skew_x, round(m4x / vx^2, 4) AS kurt_x,
       round(my, 4) AS mean_y, round(vy, 4) AS var_y,
       round(m3y / vy^1.5, 4) AS skew_y, round(m4y / vy^2, 4) AS kurt_y,
       round(cxy, 4) AS cov_xy, round(cxy / sqrt(vx * vy), 4) AS corr_xy
FROM mo
""",
        "agg_t_test": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
a AS (SELECT count(*)::DOUBLE AS n_a, avg(len(tl)) AS mean_a, var_samp(len(tl)) AS var_a
      FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
b AS (SELECT count(*)::DOUBLE AS n_b, avg(len(tl)) AS mean_b, var_samp(len(tl)) AS var_b
      FROM toks WHERE list_has_any(tl, ['window','agg','batch','scan']))
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round((mean_a - mean_b) / sqrt(var_a/n_a + var_b/n_b), 4) AS t,
       round((var_a/n_a + var_b/n_b)^2 /
             ((var_a/n_a)^2/(n_a-1) + (var_b/n_b)^2/(n_b-1)), 4) AS df
FROM a, b
""",
        "agg_rate": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
hist AS (SELECT strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM matched GROUP BY 1)
SELECT period, n_docs, round(n_docs * 3600.0 / 86400.0, 4) AS rate
FROM hist ORDER BY period
""",
        "bm25_intervals_filter": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
pos AS (SELECT doc_id, unnest(tl) AS term, generate_subscripts(tl, 1) AS i FROM toks),
src AS (
  SELECT a.doc_id, a.i AS ss, a.i + 1 AS se
  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  WHERE a.term = 'spark' AND b.term = 'join'
),
flt AS (SELECT doc_id, i FROM pos WHERE term = 'query'),
kept AS (
  SELECT s.doc_id, count(*) AS n_hits
  FROM src s
  WHERE EXISTS (SELECT 1 FROM flt f WHERE f.doc_id = s.doc_id AND s.se < f.i)
  GROUP BY 1
),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT k.doc_id, round(s.s, 4) AS score, CAST(k.n_hits AS BIGINT) AS n_hits
FROM kept k JOIN scores s USING (doc_id)
ORDER BY round(s.s, 4) DESC, k.doc_id ASC LIMIT 30
""",
        "bm25_intervals": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
tokp AS (SELECT toks.doc_id, r.i AS pos, toks.tl[r.i] AS term
         FROM toks, unnest(range(1, len(toks.tl) + 1)) AS r(i)),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
a1 AS (SELECT doc_id, pos FROM tokp WHERE term = 'row'),
b1 AS (SELECT doc_id, pos FROM tokp WHERE term = 'scan'),
hits_a AS (
  SELECT DISTINCT b1.doc_id FROM b1
  WHERE EXISTS (SELECT 1 FROM a1 WHERE a1.doc_id = b1.doc_id
                AND a1.pos < b1.pos AND b1.pos - a1.pos - 1 <= 2)),
tf_a AS (SELECT toks.doc_id, u.term, count(*) AS tf
         FROM toks, unnest(toks.tl) AS u(term)
         WHERE u.term IN ('row', 'scan') GROUP BY 1, 2),
df_a AS (SELECT term, count(*) AS df FROM tf_a GROUP BY 1),
sc_a AS (
  SELECT tf_a.doc_id,
         sum( ln(1 + (stats.n - df_a.df + 0.5) / (df_a.df + 0.5))
              * tf_a.tf / (tf_a.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf_a JOIN df_a USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE tf_a.doc_id IN (SELECT doc_id FROM hits_a)
  GROUP BY 1),
hits_b AS (
  SELECT DISTINCT a.doc_id
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'row' AND b.term IN ('merge', 'window')),
tf_b AS (SELECT toks.doc_id, u.term, count(*) AS tf
         FROM toks, unnest(toks.tl) AS u(term)
         WHERE u.term IN ('row', 'merge', 'window') GROUP BY 1, 2),
df_b AS (SELECT term, count(*) AS df FROM tf_b GROUP BY 1),
contrib_b AS (
  SELECT tf_b.doc_id, tf_b.term,
         ln(1 + (stats.n - df_b.df + 0.5) / (df_b.df + 0.5))
         * tf_b.tf / (tf_b.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS c
  FROM tf_b JOIN df_b USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
sc_b AS (
  SELECT doc_id,
         coalesce(max(c) FILTER (WHERE term = 'row'), 0)
       + coalesce(max(c) FILTER (WHERE term IN ('merge', 'window')), 0) AS s
  FROM contrib_b
  WHERE doc_id IN (SELECT doc_id FROM hits_b)
  GROUP BY 1),
comb AS (
  SELECT coalesce(sc_a.doc_id, sc_b.doc_id) AS doc_id,
         greatest(coalesce(sc_a.s, -1e18), coalesce(sc_b.s, -1e18)) AS s
  FROM sc_a FULL OUTER JOIN sc_b ON sc_a.doc_id = sc_b.doc_id)
SELECT doc_id, round(s, 4) AS score FROM comb
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 40
""",
        "agg_auto_date_histogram": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query']))
SELECT 'day' AS interval,
       strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
       CAST(count(*) AS BIGINT) AS n_docs
FROM matched GROUP BY 2 ORDER BY 2
""",
        "agg_scripted_metric": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT toks.doc_id, len(tl) AS dl, d.text
      FROM toks JOIN documents d USING (doc_id)
      WHERE list_has_any(tl, ['spark','join','query']))
SELECT round(avg(length(text)::DOUBLE / dl) * 100, 4) AS value FROM m
""",
        "agg_moving_percentiles": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
hist AS (SELECT strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM matched GROUP BY 1)
SELECT period, n_docs,
       round(quantile_cont(n_docs, 0.5) OVER (
           ORDER BY period ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_pct
FROM hist ORDER BY period
""",
        "bm25_msearch": f"""
WITH qmap(qid, term) AS (VALUES
  ('q1','spark'),('q1','join'),('q1','query'),
  ('q2','window'),('q2','agg'),('q2','batch'),('q2','scan'),
  ('q3','stream'),('q3','merge'),('q3','sort')
),
toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN (SELECT DISTINCT term FROM qmap)
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT q.qid, tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN qmap q USING (term) JOIN dfreq USING (term)
          JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1, 2
),
ranked AS (
  SELECT qid, doc_id, round(s, 4) AS score,
         CAST(row_number() OVER (PARTITION BY qid
                                 ORDER BY round(s, 4) DESC, doc_id ASC) AS INT) AS rank
  FROM scores
)
SELECT qid, doc_id, score, rank FROM ranked WHERE rank <= 10
""",
        # hard negatives: msearch top-10 minus judged positives, re-ranked
        "bm25_hard_negatives": f"""
WITH qmap(qid, term) AS (VALUES
  ('q1','spark'),('q1','join'),('q1','query'),
  ('q2','window'),('q2','agg'),('q2','batch'),('q2','scan'),
  ('q3','stream'),('q3','merge'),('q3','sort')
),
pos(qid, doc_id) AS (VALUES ('q1', 277), ('q1', 7), ('q3', 100)),
toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN (SELECT DISTINCT term FROM qmap)
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT q.qid, tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN qmap q USING (term) JOIN dfreq USING (term)
          JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1, 2
),
ranked AS (
  SELECT qid, doc_id, round(s, 4) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(s, 4) DESC, doc_id ASC) AS rank
  FROM scores
),
neg AS (
  SELECT r.qid, r.doc_id, r.score
  FROM ranked r LEFT JOIN pos p ON p.qid = r.qid AND p.doc_id = r.doc_id
  WHERE r.rank <= 10 AND p.doc_id IS NULL
)
SELECT qid, doc_id, score,
       CAST(row_number() OVER (PARTITION BY qid
                               ORDER BY score DESC, doc_id ASC) AS INT) AS neg_rank
FROM neg
""",
        # dis_max: per-sub BM25 sums, then max + 0.3*(sum-max) per doc
        "bm25_dis_max": f"""
WITH smap(sub, term) AS (VALUES
  (0,'spark'),(0,'join'),(1,'query'),(1,'batch'),(2,'scan')
),
toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN (SELECT DISTINCT term FROM smap)
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
subsc AS (
  SELECT m.sub, tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN smap m USING (term) JOIN dfreq USING (term)
          JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1, 2
),
agg AS (
  SELECT doc_id, max(s) + 0.3 * (sum(s) - max(s)) AS s FROM subsc GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM agg
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        # _rank_eval: rank per qid (rounded score, doc_id tiebreak), then
        # precision@10 / recall@10 / MRR / nDCG against the judgements
        "bm25_rank_eval": f"""
WITH qmap(qid, term) AS (VALUES
  ('q1','spark'),('q1','join'),('q1','query'),
  ('q2','window'),('q2','agg'),('q2','batch'),('q2','scan')
),
ratings(qid, doc_id, rel) AS (VALUES
  ('q1',277,3),('q1',483,1),('q1',241,2),('q1',103,1),('q1',7,2),('q1',399,1),
  ('q2',42,3),('q2',222,2),('q2',345,1),('q2',5,1)
),
toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN (SELECT DISTINCT term FROM qmap)
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT q.qid, tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN qmap q USING (term) JOIN dfreq USING (term)
          JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1, 2
),
hits AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(s, 4) DESC, doc_id ASC) AS rank
  FROM scores QUALIFY rank <= 10
),
j AS (
  SELECT h.qid, h.rank, coalesce(r.rel, 0) AS rel
  FROM hits h LEFT JOIN ratings r USING (qid, doc_id)
),
perq AS (
  SELECT qid, count(*) AS retrieved,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS rel_ret,
         max(CASE WHEN rel > 0 THEN 1.0 / rank ELSE 0.0 END) AS mrr,
         sum((pow(2.0, rel) - 1) / log2(rank + 1)) AS dcg
  FROM j GROUP BY 1
),
ideal AS (
  SELECT qid, sum((pow(2.0, rel) - 1) / log2(rn + 1)) AS idcg
  FROM (SELECT qid, rel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY rel DESC, doc_id ASC) AS rn
        FROM ratings WHERE rel > 0)
  WHERE rn <= 10 GROUP BY 1
),
tot AS (
  SELECT qid, sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS total_rel
  FROM ratings GROUP BY 1
),
qids(qid) AS (VALUES ('q1'),('q2'))
SELECT qids.qid,
       CAST(coalesce(retrieved, 0) AS INT) AS retrieved,
       round(CASE WHEN coalesce(retrieved, 0) > 0
                  THEN coalesce(rel_ret, 0) / CAST(retrieved AS DOUBLE)
                  ELSE 0.0 END, 6) AS precision_k,
       round(CASE WHEN coalesce(total_rel, 0) > 0
                  THEN coalesce(rel_ret, 0) / CAST(total_rel AS DOUBLE)
             END, 6) AS recall_k,
       round(coalesce(mrr, 0.0), 6) AS mrr,
       round(CASE WHEN idcg IS NOT NULL
                  THEN coalesce(dcg, 0.0) / idcg END, 6) AS ndcg
FROM qids LEFT JOIN perq ON qids.qid = perq.qid
          LEFT JOIN ideal ON qids.qid = ideal.qid
          LEFT JOIN tot ON qids.qid = tot.qid
ORDER BY qids.qid
""",
        "bm25_search_after": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 15 OFFSET 20
""",
        "lm_dirichlet_topk": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
coll AS (SELECT sum(dl) AS c FROM dl),
ttf AS (
  SELECT u.term, count(*) AS ttf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1
),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
scores AS (
  SELECT tf.doc_id,
         sum( greatest(0.0,
              ln(1 + tf.tf / (2000.0 * (ttf.ttf / coll.c)))
              + ln(2000.0 / (dl.dl + 2000.0)) ) ) AS s
  FROM tf JOIN ttf USING (term) JOIN dl USING (doc_id) CROSS JOIN coll
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "doc_stratified_sample": """
SELECT doc_id, lang FROM documents
WHERE (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 4294967296)
      < (CASE lang WHEN 'en' THEN 2147483648 WHEN 'es' THEN 1073741824
                   WHEN 'fr' THEN 429496730 ELSE 85899346 END)
""",
        "bm25_delete_by_query": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('window', 'agg', 'batch', 'scan')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
WHERE doc_id NOT IN (SELECT doc_id FROM toks WHERE list_contains(tl, 'batch'))
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "bm25_purged_compact": f"""
WITH toks AS (
  SELECT doc_id, tl FROM (SELECT doc_id, {TOK} AS tl FROM documents)
  WHERE NOT list_contains(tl, 'batch')
),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('window', 'agg', 'batch', 'scan')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "bm25_highlight": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT s.doc_id, round(s.s, 4) AS score,
       regexp_replace(d.text, '\\b(query|spark|join)\\b', '<em>\\1</em>', 'gi')
         AS highlight
FROM scores s JOIN documents d USING (doc_id)
ORDER BY round(s.s, 4) DESC, s.doc_id ASC LIMIT 20
""",
        "agg_date_histogram": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query']))
SELECT strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
       CAST(count(*) AS BIGINT) AS n_docs
FROM matched GROUP BY 1 ORDER BY 1
""",
        # random_sampler: deterministic md5 50% sample of the matches,
        # doc_count background-scaled by 1/p
        "agg_random_sampler": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT toks.doc_id, len(tl) AS dl FROM toks
      WHERE list_has_any(tl, ['spark','join','query'])),
s AS (SELECT * FROM m
      WHERE (('0x' || substr(md5('rs:' || doc_id::VARCHAR), 1, 8))::UBIGINT
             % 4294967296) < {int(round(0.5 * 2**32))})
SELECT CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(round(count(*) / 0.5) AS BIGINT) AS doc_count,
       round(avg(dl), 4) AS avg_dl
FROM s
""",
        # bucket_correlation: Pearson corr of day-bucket counts vs the
        # caller indicator series, joined by bucket ordinal
        "agg_bucket_correlation": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT toks.doc_id FROM toks
      WHERE list_has_any(tl, ['spark','join','query'])),
hist AS (SELECT strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
                count(*)::DOUBLE AS v
         FROM m GROUP BY 1),
idx AS (SELECT v, row_number() OVER (ORDER BY period) - 1 AS i FROM hist),
ind AS (SELECT unnest(range(10)) AS i,
               unnest([1.0,2.0,3.0,4.0,5.0,1.0,2.0,3.0,4.0,5.0]) AS w)
SELECT CAST(count(*) AS BIGINT) AS n_buckets, round(corr(v, w), 4) AS corr
FROM idx JOIN ind USING (i)
""",
        # change_point (step form): argmax Welch t-stat split of the day
        # histogram, >=2 buckets each side, tie-break rounded-stat/period
        "agg_change_point": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT toks.doc_id FROM toks
      WHERE list_has_any(tl, ['spark','join','query'])),
hist AS (SELECT strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
                count(*)::DOUBLE AS v
         FROM m GROUP BY 1),
pre AS (SELECT period,
               count(v) OVER w1 AS n1, sum(v) OVER w1 AS s1, sum(v*v) OVER w1 AS q1
        FROM hist
        WINDOW w1 AS (ORDER BY period ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
tot AS (SELECT count(*) AS nt, sum(v) AS st, sum(v*v) AS qt FROM hist),
j AS (SELECT period, n1, nt - n1 AS n2, s1, st - s1 AS s2, q1, qt - q1 AS q2
      FROM pre CROSS JOIN tot),
sc AS (SELECT period,
              (s2/n2 - s1/n1)
              / nullif(sqrt((q1 - s1*s1/n1)/n1/n1 + (q2 - s2*s2/n2)/n2/n2), 0) AS stat
       FROM j WHERE n1 >= 2 AND n2 >= 2)
SELECT period, round(stat, 4) AS stat,
       CASE WHEN stat >= 0 THEN 'step_up' ELSE 'step_down' END AS type
FROM sc WHERE stat IS NOT NULL
ORDER BY round(abs(stat), 6) DESC, period ASC LIMIT 1
""",
        # terms lookup: filter term set = doc 7's analyzed tokens, every
        # match scores the boost (filter context)
        "terms_lookup": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
lkt AS (SELECT DISTINCT u.term FROM toks, unnest(toks.tl) AS u(term)
        WHERE doc_id = 7),
m AS (SELECT DISTINCT toks.doc_id FROM toks, unnest(toks.tl) AS u(term)
      WHERE u.term IN (SELECT term FROM lkt))
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM m ORDER BY doc_id ASC
""",
        # kNN similarity floor: drop vectors under 0.2 cosine before the
        # top-k cut
        "emb_knn_min_sim": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS cos
            FROM embeddings
            WHERE round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) >= 0.2
            ORDER BY round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) DESC,
                     vec_id ASC
            LIMIT 50
        """,
        "agg_extended_stats": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id, len(tl) AS dl FROM toks
            WHERE list_has_any(tl, ['spark','join','query']))
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(dl) AS BIGINT) AS min_dl,
       CAST(max(dl) AS BIGINT) AS max_dl,
       CAST(sum(dl) AS BIGINT) AS sum_dl,
       round(avg(dl), 4) AS avg_dl,
       round(var_pop(dl), 4) AS var_dl,
       round(stddev_pop(dl), 4) AS std_dl
FROM matched
""",
        "agg_cardinality": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query']))
SELECT CAST(count(DISTINCT d.source) AS BIGINT) AS n_values
FROM matched m JOIN documents d USING (doc_id)
""",
        "agg_top_hits": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
ranked AS (
  SELECT d.lang, s.doc_id, round(s.s, 4) AS score,
         CAST(row_number() OVER (PARTITION BY d.lang
                                 ORDER BY round(s.s, 4) DESC, s.doc_id ASC) AS INT) AS rank
  FROM scores s JOIN documents d USING (doc_id)
)
SELECT lang, doc_id, score, rank FROM ranked WHERE rank <= 3
""",
        "agg_significant_terms": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
n_bg AS (SELECT count(*) AS n FROM toks),
matched AS (SELECT doc_id, tl FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
n_fg AS (SELECT count(*) AS n FROM matched),
fg AS (
  SELECT u.term, CAST(count(*) AS BIGINT) AS fg_df
  FROM matched, unnest(list_distinct(matched.tl)) AS u(term)
  GROUP BY 1 HAVING count(*) >= 3
),
bg AS (
  SELECT u.term, CAST(count(*) AS BIGINT) AS bg_df
  FROM toks, unnest(list_distinct(toks.tl)) AS u(term)
  WHERE u.term IN (SELECT term FROM fg)
  GROUP BY 1
),
scored AS (
  SELECT fg.term, fg.fg_df, bg.bg_df,
         (fg.fg_df / CAST(n_fg.n AS DOUBLE) - bg.bg_df / CAST(n_bg.n AS DOUBLE))
           * ((fg.fg_df / CAST(n_fg.n AS DOUBLE)) / (bg.bg_df / CAST(n_bg.n AS DOUBLE)))
           AS jlh
  FROM fg JOIN bg USING (term) CROSS JOIN n_fg CROSS JOIN n_bg
  WHERE fg.fg_df / CAST(n_fg.n AS DOUBLE) > bg.bg_df / CAST(n_bg.n AS DOUBLE)
)
SELECT term, fg_df, bg_df, round(jlh, 6) AS jlh FROM scored
ORDER BY round(jlh, 9) DESC, term ASC LIMIT 12
""",
        "agg_significant_text": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
n_bg AS (SELECT count(*) AS n FROM toks),
m0 AS (SELECT doc_id, tl FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
matched AS (
  SELECT doc_id, tl FROM (
    SELECT doc_id, tl,
           row_number() OVER (PARTITION BY md5(array_to_string(tl, ' '))
                              ORDER BY doc_id ASC) AS rn
    FROM m0) WHERE rn = 1),
n_fg AS (SELECT count(*) AS n FROM matched),
fg AS (
  SELECT u.term, CAST(count(*) AS BIGINT) AS fg_df
  FROM matched, unnest(list_distinct(matched.tl)) AS u(term)
  GROUP BY 1 HAVING count(*) >= 3
),
bg AS (
  SELECT u.term, CAST(count(*) AS BIGINT) AS bg_df
  FROM toks, unnest(list_distinct(toks.tl)) AS u(term)
  WHERE u.term IN (SELECT term FROM fg)
  GROUP BY 1
),
scored AS (
  SELECT fg.term, fg.fg_df, bg.bg_df,
         (fg.fg_df / CAST(n_fg.n AS DOUBLE) - bg.bg_df / CAST(n_bg.n AS DOUBLE))
           * ((fg.fg_df / CAST(n_fg.n AS DOUBLE)) / (bg.bg_df / CAST(n_bg.n AS DOUBLE)))
           AS jlh
  FROM fg JOIN bg USING (term) CROSS JOIN n_fg CROSS JOIN n_bg
  WHERE fg.fg_df / CAST(n_fg.n AS DOUBLE) > bg.bg_df / CAST(n_bg.n AS DOUBLE)
)
SELECT term, fg_df, bg_df, round(jlh, 6) AS jlh FROM scored
ORDER BY round(jlh, 9) DESC, term ASC LIMIT 12
""",
        "bm25_direct": _bm25_sql(BM25_Q1, 20),
        "bm25_direct_q2": _bm25_sql(BM25_Q2, 15),
        "bm25_via_index": _bm25_sql(BM25_Q1, 20),
        "river_jdbc_build": _river_bm25_sql(BM25_Q1, 20, 400),
        "river_cdc_feed": f"""
WITH docs2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 11
              THEN 'cdcfeedy cdcfeedy fdq' || CAST(doc_id % 5 AS VARCHAR)
              ELSE text END AS text
  FROM documents WHERE doc_id % 103 <> 9
  UNION ALL
  SELECT * FROM (VALUES (1000000001, 'fresh cdcfeedy doc spark join'),
                        (1000000002, 'another cdcfeedy query window'),
                        (1000000003, 'third cdcfeedy insert scan'))
         AS v(doc_id, text)),
toks AS (SELECT doc_id, {TOK} AS tl FROM docs2),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query', 'cdcfeedy')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "geo_distance_search": f"""
WITH geo AS (
  SELECT doc_id, text,
         {_geo_hav_sql(_GEO_SQL_LAT, _GEO_SQL_LON)} AS dist_km
  FROM documents),
base AS (SELECT doc_id, text FROM geo WHERE dist_km <= {_GEO_RADIUS_KM!r}),
toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE tf.doc_id IN (SELECT doc_id FROM base)
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "geo_distance_sorted": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (
  SELECT DISTINCT toks.doc_id
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')),
geo AS (
  SELECT doc_id, {_geo_hav_sql(_GEO_SQL_LAT, _GEO_SQL_LON)} AS dist_km
  FROM documents WHERE doc_id IN (SELECT doc_id FROM matched))
SELECT doc_id, round(dist_km, 4) AS dist_km
FROM (SELECT * FROM geo ORDER BY dist_km ASC, doc_id ASC LIMIT 25)
ORDER BY doc_id
""",
        "geo_tile_grid": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (
  SELECT DISTINCT toks.doc_id
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')),
coords AS (
  SELECT doc_id,
         greatest(least({_GEO_SQL_LAT}, 85.05112878), -85.05112878) AS lat,
         {_GEO_SQL_LON} AS lon
  FROM documents WHERE doc_id IN (SELECT doc_id FROM matched)),
tiles AS (
  SELECT '4/' ||
    CAST(greatest(least(CAST(floor((lon + 180.0) / 360.0 * 16.0) AS BIGINT), 15), 0) AS VARCHAR)
    || '/' ||
    CAST(greatest(least(CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * 16.0) AS BIGINT), 15), 0) AS VARCHAR)
    AS key
  FROM coords)
SELECT key, count(*) AS doc_count FROM tiles
GROUP BY key ORDER BY doc_count DESC, key ASC LIMIT 15
""",
        "cdc_posting_merge": f"""
WITH docs2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 3
              THEN 'mrgupdx mrgupdx uniqz' || CAST(doc_id % 7 AS VARCHAR)
              ELSE text END AS text
  FROM documents),
toks AS (SELECT doc_id, {TOK} AS tl FROM docs2),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query', 'mrgupdx')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "bm25_sparse_vector": f"""
WITH w AS (SELECT * FROM (VALUES ('spark', 2.0), ('window', 0.5), ('agg', 1.5),
                                 ('scan', 0.8)) AS v(term, wt)),
toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN (SELECT term FROM w)
  GROUP BY 1, 2
),
scores AS (
  SELECT tf.doc_id,
         sum( w.wt * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN w USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "bm25_via_compacted": _bm25_sql(BM25_Q2, 15),
        "bm25_more_like_this": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
src AS (
  SELECT u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term) WHERE toks.doc_id = 42 GROUP BY 1
),
alldf AS (
  SELECT u.term, count(DISTINCT toks.doc_id) AS df
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN (SELECT term FROM src)
  GROUP BY 1
),
qterms AS (
  SELECT src.term
  FROM src JOIN alldf USING (term) CROSS JOIN stats
  ORDER BY round(src.tf * ln(1 + (stats.n - alldf.df + 0.5) / (alldf.df + 0.5)), 6) DESC,
           src.term ASC
  LIMIT 5
),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN (SELECT term FROM qterms)
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores WHERE doc_id <> 42
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 15
""",
        "bm25_filtered": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT s.doc_id, round(s.s, 4) AS score
FROM scores s JOIN documents d ON d.doc_id = s.doc_id
WHERE d.lang = 'en' AND d.source <> 'src3'
ORDER BY round(s.s, 4) DESC, s.doc_id ASC LIMIT 20
""",
        "bm25_filtered_alias": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT s.doc_id, round(s.s, 4) AS score
FROM scores s JOIN documents d ON d.doc_id = s.doc_id
WHERE d.lang = 'en' AND d.source <> 'src3'
ORDER BY round(s.s, 4) DESC, s.doc_id ASC LIMIT 20
""",
        "match_aggs_by_lang": f"""
WITH toks AS (SELECT doc_id, lang, {TOK} AS tl FROM documents),
matched AS (
  SELECT DISTINCT toks.doc_id
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
)
SELECT t.lang AS lang, count(*) AS n_docs, round(avg(len(t.tl)), 4) AS avg_dl
FROM matched m JOIN toks t ON t.doc_id = m.doc_id
GROUP BY t.lang
""",
        "bm25_conjunctive": _bm25_conj_sql(BM25_Q1, 20),
        "bm25_prefix_via_index": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term LIKE 'sca%'
  GROUP BY 1, 2
),
dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
  ORDER BY df DESC, term ASC LIMIT 50
),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS c
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, round(max(c), 4) AS score FROM contrib
GROUP BY doc_id
ORDER BY round(max(c), 4) DESC, doc_id ASC LIMIT 30
""",
        "bm25_phrase_via_index": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
m AS (SELECT doc_id FROM toks
      WHERE strpos(' ' || array_to_string(tl, ' ') || ' ', ' row scan ') > 0),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('row', 'scan')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE tf.doc_id IN (SELECT doc_id FROM m)
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 40
""",
        # ordered proximity: end positions of 'scan' with a 'row' strictly
        # before within a 2-token stretch; scored BM25 over the two terms
        "bm25_phrase_slop": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
tokp AS (SELECT toks.doc_id, r.i AS pos, toks.tl[r.i] AS term
         FROM toks, unnest(range(1, len(toks.tl) + 1)) AS r(i)),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
a AS (SELECT doc_id, pos FROM tokp WHERE term = 'row'),
b AS (SELECT doc_id, pos FROM tokp WHERE term = 'scan'),
hits AS (
  SELECT b.doc_id, count(*) AS n_hits FROM b
  WHERE EXISTS (SELECT 1 FROM a WHERE a.doc_id = b.doc_id
                AND a.pos < b.pos AND b.pos - a.pos - 1 <= 2)
  GROUP BY 1),
tf AS (SELECT toks.doc_id, u.term, count(*) AS tf
       FROM toks, unnest(toks.tl) AS u(term)
       WHERE u.term IN ('row', 'scan') GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE tf.doc_id IN (SELECT doc_id FROM hits)
  GROUP BY 1)
SELECT h.doc_id, h.n_hits::BIGINT AS n_hits, round(s.s, 4) AS score
FROM hits h JOIN scores s USING (doc_id)
ORDER BY round(s.s, 4) DESC, h.doc_id ASC LIMIT 40
""",
        # wildcard expansion: anchored 'sc.*n' over the vocabulary,
        # df-desc cutoff at 50, best-expansion BM25 per doc
        "bm25_wildcard_query": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
vocab AS (SELECT u.term, count(DISTINCT toks.doc_id) AS df
          FROM toks, unnest(toks.tl) AS u(term) GROUP BY 1),
exp AS (SELECT term, df FROM vocab
        WHERE regexp_full_match(term, 'sc.*n')
        ORDER BY df DESC, term ASC LIMIT 50),
tf AS (SELECT toks.doc_id, u.term, count(*) AS tf
       FROM toks, unnest(toks.tl) AS u(term)
       WHERE u.term IN (SELECT term FROM exp) GROUP BY 1, 2),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.n - exp.df + 0.5) / (exp.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS c
  FROM tf JOIN exp USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
SELECT doc_id, round(max(c), 4) AS score FROM contrib
GROUP BY doc_id ORDER BY round(max(c), 4) DESC, doc_id ASC LIMIT 30
""",
        "bm25_regexp_query": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
vocab AS (SELECT u.term, count(DISTINCT toks.doc_id) AS df
          FROM toks, unnest(toks.tl) AS u(term) GROUP BY 1),
exp AS (SELECT term, df FROM vocab
        WHERE regexp_full_match(term, 's[cp]a[a-z]*|join')
        ORDER BY df DESC, term ASC LIMIT 50),
tf AS (SELECT toks.doc_id, u.term, count(*) AS tf
       FROM toks, unnest(toks.tl) AS u(term)
       WHERE u.term IN (SELECT term FROM exp) GROUP BY 1, 2),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.n - exp.df + 0.5) / (exp.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS c
  FROM tf JOIN exp USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
SELECT doc_id, round(max(c), 4) AS score FROM contrib
GROUP BY doc_id ORDER BY round(max(c), 4) DESC, doc_id ASC LIMIT 30
""",
        "bm25_update_by_query": f"""
WITH d2 AS (SELECT doc_id,
                   CASE WHEN list_contains({TOK}, 'scan')
                        THEN text || ' graftterm' ELSE text END AS text
            FROM documents),
toks AS (SELECT doc_id, {TOK} AS tl FROM d2),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('graftterm', 'window')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 20
""",
        "bm25_has_parent": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 25
""",
        "agg_subaggs_tree": f"""
WITH toks AS (SELECT doc_id, lang, source, {TOK} AS tl FROM documents),
matched AS (SELECT DISTINCT toks.doc_id
            FROM toks, unnest(toks.tl) AS u(term)
            WHERE u.term IN ('spark', 'join', 'query')),
base AS (SELECT t.lang, t.source, len(t.tl) AS dl
         FROM matched m JOIN toks t USING (doc_id)),
l1 AS (SELECT lang, count(*) AS by_lang_count, avg(dl) AS avg_dl
       FROM base WHERE lang IS NOT NULL GROUP BY lang
       ORDER BY by_lang_count DESC, lang ASC LIMIT 3),
l2 AS (SELECT lang, source, count(*) AS by_src_count, max(dl) AS max_dl,
              row_number() OVER (PARTITION BY lang
                                 ORDER BY count(*) DESC, source ASC) AS rn
       FROM base WHERE lang IS NOT NULL AND source IS NOT NULL
       GROUP BY lang, source)
SELECT l1.lang, l1.by_lang_count, round(l1.avg_dl, 4) AS avg_dl,
       l2.source, l2.by_src_count, l2.max_dl
FROM l1 JOIN l2 USING (lang) WHERE l2.rn <= 2
""",
        "doc_decontaminate": f"""
WITH t AS (SELECT doc_id, {TOK} AS toks FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
         [list_aggregate(toks[i:i+4], 'string_agg', ' ')
          FOR i IN range(1, len(toks) - 3)])) AS shingle
       FROM t WHERE len(toks) >= 5),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 13 = 0),
agg AS (SELECT s.doc_id, count(*) AS n_shingles,
               count(ev.shingle) AS n_hits
        FROM sh s LEFT JOIN ev ON s.shingle = ev.shingle GROUP BY 1)
SELECT d.doc_id,
       coalesce(a.n_shingles, 0) AS n_shingles,
       coalesce(a.n_hits, 0) AS n_hits,
       coalesce(a.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN agg a USING (doc_id)
""",
        # fuzzy expansion: vocabulary terms within 1 edit of 'qury'
        # (length-guarded), closest-first / df-desc / term-asc cutoff at
        # 50, then best-expansion BM25 per doc (max contrib)
        "bm25_fuzzy_query": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
vocab AS (SELECT u.term, count(DISTINCT toks.doc_id) AS df
          FROM toks, unnest(toks.tl) AS u(term) GROUP BY 1),
exp AS (SELECT term, df FROM vocab
        WHERE abs(length(term) - 4) <= 1 AND levenshtein(term, 'qury') <= 1
        ORDER BY levenshtein(term, 'qury') ASC, df DESC, term ASC LIMIT 50),
tf AS (SELECT toks.doc_id, u.term, count(*) AS tf
       FROM toks, unnest(toks.tl) AS u(term)
       WHERE u.term IN (SELECT term FROM exp) GROUP BY 1, 2),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.n - exp.df + 0.5) / (exp.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS c
  FROM tf JOIN exp USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
SELECT doc_id, round(max(c), 4) AS score FROM contrib
GROUP BY doc_id ORDER BY round(max(c), 4) DESC, doc_id ASC LIMIT 30
""",
        # bool semantics: must all present, >=1 of the should terms, none
        # of the must_not terms; score sums BM25 over must+should matches
        "bm25_bool_query": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query', 'window', 'batch')
  GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
flags AS (
  SELECT doc_id,
         max(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS has_must,
         sum(CASE WHEN term IN ('join', 'query', 'window') THEN 1 ELSE 0 END) AS n_should,
         max(CASE WHEN term = 'batch' THEN 1 ELSE 0 END) AS has_not
  FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum(CASE WHEN tf.term <> 'batch' THEN
               ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
             ELSE 0 END) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1)
SELECT s.doc_id, round(s.s, 4) AS score
FROM scores s JOIN flags f USING (doc_id)
WHERE f.has_must = 1 AND f.n_should >= 1 AND f.has_not = 0
ORDER BY round(s.s, 4) DESC, s.doc_id ASC LIMIT 25
""",
        # positions-bearing edge-ngram analyzer: every gram of a source
        # token carries the token's ordinal; dl is the expanded stream
        # length; phrase terms match grams of consecutive source tokens
        "bm25_ngram_phrase_via_index": f"""
WITH t AS (SELECT doc_id, {TOK} AS tl FROM documents),
tok AS (
  SELECT t.doc_id, r.i AS pos, t.tl[r.i] AS tok
  FROM t, unnest(range(1, len(t.tl) + 1)) AS r(i)
),
g AS (
  SELECT doc_id, pos,
         unnest(CASE WHEN length(tok) < 2 THEN [tok]
                ELSE [tok[1:n] FOR n IN range(2, least(length(tok), 25) + 1)]
                END) AS gram
  FROM tok
),
gc AS (SELECT doc_id, count(*) AS c FROM g GROUP BY 1),
dl AS (SELECT t.doc_id, coalesce(gc.c, 0) AS dl FROM t LEFT JOIN gc USING (doc_id)),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
hits AS (
  SELECT a.doc_id, count(*) AS n_hits
  FROM g a JOIN g b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.gram = 'ro' AND b.gram = 'sca'
  GROUP BY 1
),
tf AS (SELECT doc_id, gram, count(*) AS tf FROM g
       WHERE gram IN ('ro', 'sca') GROUP BY 1, 2),
dfreq AS (SELECT gram, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (gram) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE tf.doc_id IN (SELECT doc_id FROM hits)
  GROUP BY 1
)
SELECT h.doc_id, h.n_hits::BIGINT AS n_hits, round(s.s, 4) AS score
FROM hits h JOIN scores s USING (doc_id)
ORDER BY round(s.s, 4) DESC, h.doc_id ASC LIMIT 40
""",
        # multi_match best_fields (tie_breaker=0.3): each field scored with
        # its OWN stats (df/avgdl/N over that field's corpus), boost 2.0 on
        # source; combined = max + 0.3*(sum-max) per doc
        "bm25_multi_match": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'src3')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
ftext AS (
  SELECT tf.doc_id,
         1.0 * sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS fs
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
stoks AS (SELECT doc_id,
          regexp_extract_all(lower(strip_accents(source)), '[0-9a-z]+') AS tl
          FROM documents),
sdl AS (SELECT doc_id, len(tl) AS dl FROM stoks),
sstats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM sdl),
stf AS (
  SELECT stoks.doc_id, u.term, count(*) AS tf
  FROM stoks, unnest(stoks.tl) AS u(term)
  WHERE u.term IN ('spark', 'src3')
  GROUP BY 1, 2
),
sdfreq AS (SELECT term, count(*) AS df FROM stf GROUP BY 1),
fsrc AS (
  SELECT stf.doc_id,
         2.0 * sum( ln(1 + (sstats.n - sdfreq.df + 0.5) / (sdfreq.df + 0.5))
              * stf.tf / (stf.tf + 1.2 * (0.25 + 0.75 * sdl.dl / sstats.avgdl)) ) AS fs
  FROM stf JOIN sdfreq USING (term) JOIN sdl USING (doc_id) CROSS JOIN sstats
  GROUP BY 1
),
allf AS (SELECT * FROM ftext UNION ALL SELECT * FROM fsrc),
comb AS (SELECT doc_id, max(fs) + 0.3 * (sum(fs) - max(fs)) AS s
         FROM allf GROUP BY 1)
SELECT doc_id, round(s, 4) AS score FROM comb
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 40
""",
        # percolator: stored-query term-set containment per doc
        "doc_percolate": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents)
SELECT doc_id, 'q_spark_join' AS query_id FROM toks
WHERE list_contains(tl, 'spark') AND list_contains(tl, 'join')
UNION ALL
SELECT doc_id, 'q_window' FROM toks WHERE list_contains(tl, 'window')
UNION ALL
SELECT doc_id, 'q_agg_scan' FROM toks
WHERE list_contains(tl, 'agg') AND list_contains(tl, 'scan')
""",
        "doc_percolate_phrase": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
s AS (SELECT doc_id, ' ' || array_to_string(tl, ' ') || ' ' AS ts, tl FROM toks)
SELECT doc_id, 'p_spark_join' AS query_id FROM s
WHERE instr(ts, ' spark join ') > 0
UNION ALL
SELECT doc_id, 'a_spark_join' FROM s
WHERE list_contains(tl, 'spark') AND list_contains(tl, 'join')
""",
        # range agg: explicit [from,to) buckets over matched docs' dl,
        # overlapping allowed, empty buckets kept (ES contract)
        "agg_range": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT doc_id, len(tl) AS dl FROM toks
      WHERE list_has_any(tl, ['spark', 'join', 'query']))
SELECT '*-60' AS bucket, CAST(count(*) FILTER (WHERE dl < 60) AS BIGINT) AS n_docs FROM m
UNION ALL
SELECT '60-90', CAST(count(*) FILTER (WHERE dl >= 60 AND dl < 90) AS BIGINT) FROM m
UNION ALL
SELECT '90-*', CAST(count(*) FILTER (WHERE dl >= 90) AS BIGINT) FROM m
UNION ALL
SELECT '50-80', CAST(count(*) FILTER (WHERE dl >= 50 AND dl < 80) AS BIGINT) FROM m
""",
        # filters agg: named predicate buckets over the matched set
        "agg_filters": f"""
WITH t AS (SELECT doc_id, lang, source, {TOK} AS tl FROM documents),
m AS (SELECT * FROM t WHERE list_has_any(tl, ['spark', 'join', 'query']))
SELECT 'en' AS bucket, CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_docs FROM m
UNION ALL
SELECT 'zh_or_fr', CAST(count(*) FILTER (WHERE lang IN ('zh', 'fr')) AS BIGINT) FROM m
UNION ALL
SELECT 'src0', CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) FROM m
UNION ALL
SELECT 'none', CAST(count(*) FILTER (WHERE lang = 'xx') AS BIGINT) FROM m
""",
        # composite agg: deterministic bucket-tuple paging (row-value
        # comparison resumes strictly after the key)
        "agg_composite": f"""
WITH t AS (SELECT doc_id, lang, source, {TOK} AS tl FROM documents),
m AS (SELECT * FROM t WHERE list_has_any(tl, ['spark', 'join', 'query'])),
g AS (SELECT lang AS role, source AS tool, CAST(count(*) AS BIGINT) AS n_docs
      FROM m GROUP BY 1, 2)
SELECT role, tool, n_docs FROM g WHERE (role, tool) > ('en', 'src3')
ORDER BY role, tool LIMIT 10
""",
        # composite with mixed sources: calendar-day key + terms key
        "agg_composite_mixed": f"""
WITH t AS (SELECT doc_id, lang, {TOK} AS tl FROM documents),
m AS (SELECT * FROM t WHERE list_has_any(tl, ['spark', 'join', 'query']))
SELECT strftime(date '2026-01-01' + INTERVAL ((doc_id % 10)::INT) DAY, '%Y-%m-%d') AS day,
       lang AS role, CAST(count(*) AS BIGINT) AS n_docs
FROM m GROUP BY 1, 2 ORDER BY 1, 2
""",
        # pipeline aggs over the date_histogram parent: running total,
        # first-order diff, trailing-3 moving avg (frame excludes the
        # current bucket), bucket_script share-of-total
        "agg_pipeline": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
hist AS (
  SELECT strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM matched GROUP BY 1
)
SELECT period, n_docs,
       CAST(sum(n_docs) OVER (ORDER BY period) AS BIGINT) AS cum_docs,
       CAST(n_docs - lag(n_docs) OVER (ORDER BY period) AS BIGINT) AS deriv,
       round(avg(n_docs) OVER (ORDER BY period ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 4)
         AS moving_avg,
       round(CAST(n_docs AS DOUBLE) / (sum(n_docs) OVER (ORDER BY period)), 4) AS script_val
FROM hist ORDER BY period
""",
        # date_range agg: explicit [from,to) ts buckets, empty kept
        "agg_date_range": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT CAST(DATE '2026-01-01' + (doc_id % 10)::INT AS TIMESTAMP) AS ts
      FROM toks WHERE list_has_any(tl, ['spark','join','query']))
SELECT '*-2026-01-04' AS bucket,
       CAST(count(*) FILTER (WHERE ts < TIMESTAMP '2026-01-04') AS BIGINT) AS n_docs FROM m
UNION ALL
SELECT '2026-01-04-2026-01-08',
       CAST(count(*) FILTER (WHERE ts >= TIMESTAMP '2026-01-04'
                              AND ts < TIMESTAMP '2026-01-08') AS BIGINT) FROM m
UNION ALL
SELECT '2026-01-08-*',
       CAST(count(*) FILTER (WHERE ts >= TIMESTAMP '2026-01-08') AS BIGINT) FROM m
UNION ALL
SELECT '2026-01-03-*',
       CAST(count(*) FILTER (WHERE ts >= TIMESTAMP '2026-01-03') AS BIGINT) FROM m
""",
        # multi_terms agg: composite-key top buckets, tie key-asc
        "agg_multi_terms": f"""
WITH t AS (SELECT doc_id, lang, source, {TOK} AS tl FROM documents),
m AS (SELECT * FROM t WHERE list_has_any(tl, ['spark','join','query']))
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
FROM m WHERE lang IS NOT NULL AND source IS NOT NULL
GROUP BY 1, 2 ORDER BY n_docs DESC, lang, source LIMIT 10
""",
        # rare_terms agg: long-tail buckets under the doc-count ceiling
        "agg_rare_terms": f"""
WITH t AS (SELECT doc_id, source, {TOK} AS tl FROM documents),
m AS (SELECT * FROM t WHERE list_has_any(tl, ['spark','join','query']))
SELECT source, CAST(count(*) AS BIGINT) AS n_docs
FROM m WHERE source IS NOT NULL
GROUP BY 1 HAVING count(*) <= 23 ORDER BY n_docs, source
""",
        # adjacency_matrix agg: named filters + non-empty intersections
        "agg_adjacency_matrix": f"""
WITH t AS (SELECT doc_id, lang, source, {TOK} AS tl FROM documents),
m AS (SELECT * FROM t WHERE list_has_any(tl, ['spark','join','query'])),
b AS (
  SELECT 'en' AS bucket, CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_docs FROM m
  UNION ALL
  SELECT 'zh', CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) FROM m
  UNION ALL
  SELECT 's0', CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) FROM m
  UNION ALL
  SELECT 'en&s0', CAST(count(*) FILTER (WHERE lang = 'en' AND source = 'src0') AS BIGINT) FROM m
  UNION ALL
  SELECT 'en&zh', CAST(count(*) FILTER (WHERE lang = 'en' AND lang = 'zh') AS BIGINT) FROM m
  UNION ALL
  SELECT 's0&zh', CAST(count(*) FILTER (WHERE lang = 'zh' AND source = 'src0') AS BIGINT) FROM m
)
SELECT bucket, n_docs FROM b WHERE n_docs > 0
""",
        # weighted_avg agg: dl weighted by total query-term tf
        "agg_weighted_avg": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT len(tl) AS dl,
             len(list_filter(tl, t -> t IN ('spark','join','query'))) AS w
      FROM toks)
SELECT round(sum(w * dl) / sum(w), 6) AS weighted_avg_dl,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(w) AS BIGINT) AS sum_weight
FROM m WHERE w > 0
""",
        # diversified_sampler: document-order sample, <=3 per lang, first
        # 60, then source facets over the sample only
        "agg_sampler": f"""
WITH t AS (SELECT doc_id, lang, source, {TOK} AS tl FROM documents),
m AS (SELECT * FROM t WHERE list_has_any(tl, ['spark','join','query'])
                        AND lang IS NOT NULL),
capped AS (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY CAST(doc_id AS VARCHAR)) AS rn
  FROM m
),
sample AS (
  SELECT * FROM capped WHERE rn <= 3
  ORDER BY CAST(doc_id AS VARCHAR) LIMIT 60
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs
FROM sample WHERE source IS NOT NULL
GROUP BY 1 ORDER BY n_docs DESC, source
""",
        # bucket_sort pipeline agg: buckets by count desc, page [1,5)
        "agg_bucket_sort": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
hist AS (
  SELECT strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM matched GROUP BY 1
),
r AS (SELECT *, row_number() OVER (ORDER BY n_docs DESC, period) AS rn FROM hist)
SELECT period, n_docs FROM r WHERE rn > 1 AND rn <= 5
""",
        # serial_diff pipeline agg: lag-3 differencing of the bucket stream
        "agg_serial_diff": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
hist AS (
  SELECT strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM matched GROUP BY 1
)
SELECT period, n_docs,
       CAST(n_docs - lag(n_docs, 3) OVER (ORDER BY period) AS BIGINT) AS diff
FROM hist ORDER BY period
""",
        # sibling bucket stats: one row of cross-bucket moments, extremes
        # keyed by the earliest period hitting them
        "agg_stats_bucket": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
matched AS (SELECT doc_id FROM toks WHERE list_has_any(tl, ['spark','join','query'])),
hist AS (
  SELECT strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM matched GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       round(avg(n_docs), 6) AS avg_docs,
       CAST(min(n_docs) AS BIGINT) AS min_docs,
       CAST(max(n_docs) AS BIGINT) AS max_docs,
       CAST(sum(n_docs) AS BIGINT) AS sum_docs,
       (SELECT period FROM hist ORDER BY n_docs ASC, period LIMIT 1) AS min_period,
       (SELECT period FROM hist ORDER BY n_docs DESC, period LIMIT 1) AS max_period
FROM hist
""",
        # knn-boost hybrid: bm25 + 5x cosine, union of docs, missing
        # side contributes 0; rounded-4 inputs and sum
        "hybrid_knn_boost": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         round(sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ), 4) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
ec AS (SELECT vec_id AS doc_id,
        5.0 * round(list_cosine_similarity(embedding::DOUBLE[],
          (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS c
       FROM embeddings),
u AS (SELECT doc_id, s AS c FROM scores UNION ALL SELECT doc_id, c FROM ec)
SELECT doc_id, round(sum(c), 4) AS score, CAST(count(*) AS BIGINT) AS n_retrievers
FROM u GROUP BY 1
ORDER BY round(sum(c), 4) DESC, doc_id ASC LIMIT 20
""",
        # hybrid RRF: lexical top-40 + vector top-40, both ranked on the
        # rounded score, fused 1/(60+rank), doc-id tiebreak
        "hybrid_rrf": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
br AS (SELECT doc_id, row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS r
       FROM scores QUALIFY r <= 40),
ec AS (SELECT vec_id AS doc_id,
        round(list_cosine_similarity(embedding::DOUBLE[],
          (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS c
       FROM embeddings),
er AS (SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id ASC) AS r
       FROM ec QUALIFY r <= 40),
u AS (SELECT doc_id, 1.0 / (60 + r) AS c FROM br
      UNION ALL SELECT doc_id, 1.0 / (60 + r) FROM er)
SELECT doc_id, round(sum(c), 6) AS score, CAST(count(*) AS BIGINT) AS n_retrievers
FROM u GROUP BY 1
ORDER BY round(sum(c), 6) DESC, doc_id ASC LIMIT 20
""",
        # linear retriever: minmax-normalize each top-40 window, then
        # 0.7*bm25 + 0.3*cosine over the union
        "hybrid_linear": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
br AS (SELECT doc_id, round(s, 4) AS s,
              row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS r
       FROM scores QUALIFY r <= 40),
bn AS (SELECT doc_id,
              coalesce((s - min(s) OVER ())
                       / nullif(max(s) OVER () - min(s) OVER (), 0), 0.0) AS sn
       FROM br),
ec AS (SELECT vec_id AS doc_id,
        round(list_cosine_similarity(embedding::DOUBLE[],
          (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS c
       FROM embeddings),
er AS (SELECT doc_id, c, row_number() OVER (ORDER BY c DESC, doc_id ASC) AS r
       FROM ec QUALIFY r <= 40),
en AS (SELECT doc_id,
              coalesce((c - min(c) OVER ())
                       / nullif(max(c) OVER () - min(c) OVER (), 0), 0.0) AS sn
       FROM er),
u AS (SELECT doc_id, 0.7 * sn AS c FROM bn
      UNION ALL SELECT doc_id, 0.3 * sn FROM en)
SELECT doc_id, round(sum(c), 6) AS score, CAST(count(*) AS BIGINT) AS n_retrievers
FROM u GROUP BY 1
ORDER BY round(sum(c), 6) DESC, doc_id ASC LIMIT 20
""",
        # collapse + inner_hits: top-5 language groups by their winner,
        # each expanded to its 3 best hits
        "bm25_collapse_inner_hits": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
ranked AS (
  SELECT s.doc_id, round(s.s, 4) AS score, d.lang,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY round(s.s, 4) DESC, s.doc_id ASC) AS rk
  FROM scores s JOIN documents d USING (doc_id)
),
topg AS (SELECT lang FROM ranked WHERE rk = 1
         ORDER BY score DESC, doc_id ASC LIMIT 5)
SELECT lang, doc_id, score, CAST(rk AS INT) AS hit_rank
FROM ranked WHERE rk <= 3 AND lang IN (SELECT lang FROM topg)
""",
        # children agg: matched docs bucketed by lang, stepping down to
        # all turns of their (single-turn) conversations
        "agg_children": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT toks.doc_id, len(tl) AS dl FROM toks
      WHERE list_has_any(tl, ['spark','join','query'])),
b AS (SELECT d.lang, m.doc_id, m.dl FROM m JOIN documents d USING (doc_id))
SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_parents,
       CAST(count(*) AS BIGINT) AS n_children,
       round(avg(dl), 4) AS avg_child_dl
FROM b GROUP BY 1 ORDER BY 1
""",
        # parent agg: matched docs bucketed by lang, stepping UP to their
        # (single-turn) conversations, each parent counted once
        "agg_parent": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
m AS (SELECT toks.doc_id, len(tl) AS dl FROM toks
      WHERE list_has_any(tl, ['spark','join','query'])),
b AS (SELECT d.lang, m.doc_id, m.dl FROM m JOIN documents d USING (doc_id))
SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_parents,
       round(avg(1.0), 4) AS avg_parent_turns,
       round(avg(dl), 4) AS avg_parent_dl
FROM b GROUP BY 1 ORDER BY 1
""",
        "bm25_count": f"""
SELECT CAST(count(*) AS BIGINT) AS n_matches
FROM (SELECT {TOK} AS tl FROM documents)
WHERE list_has_any(tl, ['spark', 'join', 'query'])
""",
        "doc_mget": f"""
SELECT doc_id::VARCHAR || ':0' AS doc_key, doc_id::VARCHAR AS conv_id,
       0 AS turn_idx, lang AS role, text, source AS tool
FROM documents
WHERE doc_id IN (7, 42, 123)
""",
        # seeded deterministic shuffle: first 100 of the ep1 permutation
        "doc_seeded_shuffle": """
SELECT doc_id, md5('ep1:' || doc_id::VARCHAR) AS shuffle_key
FROM documents
ORDER BY shuffle_key, doc_id
LIMIT 100
""",
        # epoch mixing: floor(e) full passes + md5-thresholded fractional
        # pass, 0-based epoch index per emitted row
        "doc_epoch_mix": """
SELECT t.doc_id, t.lang, CAST(g.epoch AS INT) AS epoch
FROM (SELECT doc_id, lang,
        (CASE lang WHEN 'en' THEN 1.5 WHEN 'fr' THEN 0.3 WHEN 'zh' THEN 2.0
         ELSE 1.0 END) AS e,
        (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 4294967296) AS h
      FROM documents) t,
unnest(range(0, floor(t.e)::BIGINT
             + CASE WHEN t.h < round((t.e - floor(t.e)) * 4294967296)::BIGINT
                    THEN 1 ELSE 0 END)) AS g(epoch)
""",
        # DSIR hashed-unigram importance log-weights, add-1 smoothing,
        # 1024 md5 buckets, target = src7 docs
        "doc_dsir_weights": (
            "SELECT doc_id, n_tokens, round(dsir_logw, 4) AS dsir_logw FROM ("
            + sampling.duckdb_dsir_sql("source = 'src7'", n_buckets=1024)
            + ")"
        ),
        # DSIR Gumbel-top-k resample over the same weights
        "doc_dsir_sample": (
            "SELECT doc_id, round(gumbel_key, 4) AS gumbel_key FROM ("
            + sampling.duckdb_dsir_select_sql(
                sampling.duckdb_dsir_sql("source = 'src7'", n_buckets=1024),
                k=150,
                seed="dsir",
            )
            + ")"
        ),
        # temperature-0.7 domain rebalancing as fractional epochs
        "doc_temperature_mix": (
            "SELECT doc_id, "
            + "source"
            + ", epoch FROM ("
            + sampling.duckdb_temperature_mix_sql(
                "(SELECT doc_id, source FROM documents)", "source", tau=0.7
            )
            + ")"
        ),
        # exact-substring dedup: duplicated 5-token windows, first
        # occurrence kept, later ones merged into per-doc cut spans
        "doc_dup_spans": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
occ AS (
  SELECT toks.doc_id, i.i - 1 AS start,
         array_to_string(tl[i.i:i.i + 4], ' ') AS g
  FROM toks, unnest(range(1, len(tl) - 3)) AS i(i)
  WHERE len(tl) >= 5
),
st AS (SELECT doc_id, start,
       count(*) OVER (PARTITION BY g) AS cnt,
       row_number() OVER (PARTITION BY g ORDER BY doc_id, start) AS rn
       FROM occ),
fl AS (SELECT doc_id, start, start + 5 AS e FROM st WHERE cnt >= 2 AND rn > 1),
isl AS (SELECT doc_id, start, e,
        CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             OR start > max(e) OVER (PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS ns
        FROM fl),
isl2 AS (SELECT doc_id, start, e,
         sum(ns) OVER (PARTITION BY doc_id ORDER BY start) AS island FROM isl)
SELECT doc_id, CAST(min(start) AS BIGINT) AS start,
       CAST(max(e) AS BIGINT) AS "end", CAST(count(*) AS BIGINT) AS n_windows
FROM isl2 GROUP BY doc_id, island
""",
        # phrase suggester: per-token candidates (distance asc, ttf desc,
        # term asc, top-5 within 2 edits), cartesian collation, score =
        # sum ln(ttf/total) - edits, input phrase excluded
        "phrase_suggest": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
tokp AS (SELECT u.term FROM toks, unnest(toks.tl) AS u(term)),
vocab AS (SELECT term, count(*) AS ttf FROM tokp GROUP BY 1),
tot AS (SELECT sum(ttf) AS t FROM vocab),
c1 AS (SELECT term, levenshtein(term, 'pat') AS d, ttf FROM vocab
       WHERE abs(length(term) - 3) <= 2 AND levenshtein(term, 'pat') <= 2
       ORDER BY d ASC, ttf DESC, term ASC LIMIT 5),
c2 AS (SELECT term, levenshtein(term, 'sot') AS d, ttf FROM vocab
       WHERE abs(length(term) - 3) <= 2 AND levenshtein(term, 'sot') <= 2
       ORDER BY d ASC, ttf DESC, term ASC LIMIT 5),
comb AS (
  SELECT c1.term || ' ' || c2.term AS phrase,
         ln(c1.ttf / tot.t) - 1.0 * c1.d + ln(c2.ttf / tot.t) - 1.0 * c2.d AS s,
         CAST(c1.d + c2.d AS INT) AS n_edits
  FROM c1, c2, tot
  WHERE c1.term || ' ' || c2.term <> 'pat sot'
)
SELECT phrase, round(s, 4) AS score, n_edits FROM comb
ORDER BY round(s, 4) DESC, phrase ASC LIMIT 5
""",
        # boosting query: 'spark join' disjunctive BM25; docs containing
        # 'slow' demoted to 0.4x (ES demote-not-exclude semantics)
        "bm25_boosting": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('spark', 'join')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
),
neg AS (SELECT DISTINCT toks.doc_id FROM toks, unnest(toks.tl) AS u(term)
        WHERE u.term = 'slow')
SELECT doc_id,
       round(CASE WHEN doc_id IN (SELECT doc_id FROM neg)
                  THEN s * 0.4 ELSE s END, 4) AS score
FROM scores
ORDER BY score DESC, doc_id ASC LIMIT 40
""",
        # corpus unigram-LM quality: avg ln p(token) with p = ttf/total;
        # avg(ln ttf) - ln(total) keeps the only join on the vocab table
        "doc_lm_quality": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
tokp AS (SELECT toks.doc_id, u.term FROM toks, unnest(toks.tl) AS u(term)),
vocab AS (SELECT term, count(*) AS ttf FROM tokp GROUP BY 1),
tot AS (SELECT sum(ttf) AS t FROM vocab),
per AS (
  SELECT tokp.doc_id, count(*) AS n_tokens,
         avg(ln(vocab.ttf)) - ln(max(tot.t)) AS lp
  FROM tokp JOIN vocab USING (term) CROSS JOIN tot
  GROUP BY 1
)
SELECT d.doc_id, CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
       round(per.lp, 4) AS avg_logprob
FROM documents d LEFT JOIN per USING (doc_id)
""",
        "doc_nb_classifier": f"""
WITH toks AS (SELECT doc_id, source, {TOK} AS tl FROM documents),
tok AS (SELECT toks.doc_id, toks.source, u.term
        FROM toks, unnest(toks.tl) AS u(term)),
counts AS (
  SELECT term,
         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS tfp,
         sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS tfn
  FROM tok WHERE source IN ('src0', 'src1') GROUP BY 1
),
tot AS (SELECT CAST(sum(tfp) AS DOUBLE) AS tp, CAST(sum(tfn) AS DOUBLE) AS tn,
               CAST(count(*) AS DOUBLE) AS v FROM counts),
w AS (SELECT term,
             ln((tfp + 1.0) / (tp + v)) - ln((tfn + 1.0) / (tn + v)) AS weight
      FROM counts CROSS JOIN tot),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
per AS (
  SELECT tf.doc_id, sum(tf.tf) AS n_tokens,
         sum(tf.tf * coalesce(w.weight, 0.0)) / sum(tf.tf) AS s
  FROM tf LEFT JOIN w USING (term) GROUP BY 1
)
SELECT d.doc_id, CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
       round(per.s, 4) AS score, per.s > 0 AS label
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
""",
        # cross_fields: per-TERM dis-max across the text and source field
        # contributions (each field's own stats, boost 2.0 on source),
        # summed per doc
        "bm25_combined_fields": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
stoks AS (SELECT doc_id,
          regexp_extract_all(lower(strip_accents(source)), '[0-9a-z]+') AS tl
          FROM documents),
dlc AS (SELECT t.doc_id, 1.0 * len(t.tl) + 2.0 * len(s.tl) AS dlc
        FROM toks t JOIN stoks s USING (doc_id)),
stats AS (SELECT count(*) AS n, avg(dlc) AS avgdl FROM dlc),
tf1 AS (SELECT toks.doc_id, u.term, count(*) AS tf
        FROM toks, unnest(toks.tl) AS u(term)
        WHERE u.term IN ('row', 'src7', 'join') GROUP BY 1, 2),
tf2 AS (SELECT stoks.doc_id, u.term, count(*) AS tf
        FROM stoks, unnest(stoks.tl) AS u(term)
        WHERE u.term IN ('row', 'src7', 'join') GROUP BY 1, 2),
tfc AS (SELECT doc_id, term, sum(wtf) AS tfc FROM (
          SELECT doc_id, term, 1.0 * tf AS wtf FROM tf1
          UNION ALL SELECT doc_id, term, 2.0 * tf AS wtf FROM tf2) u
        GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
scores AS (
  SELECT tfc.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tfc.tfc / (tfc.tfc + 1.2 * (0.25 + 0.75 * dlc.dlc / stats.avgdl)) ) AS s
  FROM tfc JOIN dfreq USING (term) JOIN dlc USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 40
""",
        "bm25_cross_fields": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT toks.doc_id, u.term, count(*) AS tf
  FROM toks, unnest(toks.tl) AS u(term)
  WHERE u.term IN ('row', 'src7', 'join')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
ctext AS (
  SELECT tf.doc_id, tf.term,
         1.0 * ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS fs
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
),
stoks AS (SELECT doc_id,
          regexp_extract_all(lower(strip_accents(source)), '[0-9a-z]+') AS tl
          FROM documents),
sdl AS (SELECT doc_id, len(tl) AS dl FROM stoks),
sstats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM sdl),
stf AS (
  SELECT stoks.doc_id, u.term, count(*) AS tf
  FROM stoks, unnest(stoks.tl) AS u(term)
  WHERE u.term IN ('row', 'src7', 'join')
  GROUP BY 1, 2
),
sdfreq AS (SELECT term, count(*) AS df FROM stf GROUP BY 1),
csrc AS (
  SELECT stf.doc_id, stf.term,
         2.0 * ln(1 + (sstats.n - sdfreq.df + 0.5) / (sdfreq.df + 0.5))
             * stf.tf / (stf.tf + 1.2 * (0.25 + 0.75 * sdl.dl / sstats.avgdl)) AS fs
  FROM stf JOIN sdfreq USING (term) JOIN sdl USING (doc_id) CROSS JOIN sstats
),
allc AS (SELECT * FROM ctext UNION ALL SELECT * FROM csrc),
pt AS (SELECT doc_id, term, max(fs) AS mx FROM allc GROUP BY 1, 2),
agg AS (SELECT doc_id, sum(mx) AS s FROM pt GROUP BY 1)
SELECT doc_id, round(s, 4) AS score FROM agg
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 40
""",
        # match_phrase_prefix: 'row' adjacent-followed by any of the 4
        # highest-df 's%' dictionary terms; score = phrase BM25 with the
        # expansion as last term, max over matching expansions
        "bm25_phrase_prefix": f"""
WITH toks AS (SELECT doc_id, {TOK} AS tl FROM documents),
tokp AS (SELECT toks.doc_id, r.i AS pos, toks.tl[r.i] AS term
         FROM toks, unnest(range(1, len(toks.tl) + 1)) AS r(i)),
dl AS (SELECT doc_id, len(tl) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
vocab AS (SELECT u.term, count(DISTINCT toks.doc_id) AS df
          FROM toks, unnest(toks.tl) AS u(term) GROUP BY 1),
exp AS (SELECT term FROM vocab WHERE term LIKE 's%'
        ORDER BY df DESC, term ASC LIMIT 4),
hit AS (SELECT DISTINCT a.doc_id, b.term AS eterm
        FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        JOIN exp ON b.term = exp.term
        WHERE a.term = 'row'),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tokp
       WHERE term = 'row' OR term IN (SELECT term FROM exp)
       GROUP BY 1, 2),
alldf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
c AS (SELECT tf.doc_id, tf.term,
        ln(1 + (stats.n - alldf.df + 0.5) / (alldf.df + 0.5))
          * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS c
      FROM tf JOIN alldf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
es AS (SELECT hit.doc_id, cr.c + ce.c AS s
       FROM hit
       JOIN c cr ON cr.doc_id = hit.doc_id AND cr.term = 'row'
       JOIN c ce ON ce.doc_id = hit.doc_id AND ce.term = hit.eterm)
SELECT doc_id, round(max(s), 4) AS score FROM es GROUP BY 1
ORDER BY round(max(s), 4) DESC, doc_id ASC LIMIT 40
""",
        # per-period corpus statistics (ES query_then_fetch): n/avgdl/df
        # all computed within each day's sub-index, merged top-k after
        "bm25_date_routed": f"""
WITH d AS (
  SELECT doc_id,
         strftime(DATE '2026-01-01' + (doc_id % 10)::INT, '%Y-%m-%d') AS period,
         {TOK} AS tl
  FROM documents),
dl AS (SELECT doc_id, period, len(tl) AS dl FROM d),
stats AS (SELECT period, count(*) AS n, avg(dl) AS avgdl FROM dl GROUP BY 1),
tf AS (
  SELECT d.doc_id, d.period, u.term, count(*) AS tf
  FROM d, unnest(d.tl) AS u(term)
  WHERE u.term IN ('spark', 'join', 'query')
  GROUP BY 1, 2, 3),
dfreq AS (SELECT period, term, count(*) AS df FROM tf GROUP BY 1, 2),
scores AS (
  SELECT tf.doc_id, tf.period,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf
  JOIN dfreq ON dfreq.period = tf.period AND dfreq.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN stats ON stats.period = tf.period
  WHERE tf.period BETWEEN '2026-01-03' AND '2026-01-07'
  GROUP BY 1, 2)
SELECT period, doc_id, round(s, 4) AS score FROM scores
ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 25
""",
        "emb_cosine_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS cos
            FROM embeddings
            ORDER BY round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) DESC,
                     vec_id ASC
            LIMIT 10
        """,
        "emb_bbq_hamming": """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
h AS (
  SELECT e.vec_id,
         CAST(list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qv),
           s -> CASE WHEN (s[1] > 0) <> (s[2] > 0) THEN 1 ELSE 0 END)) AS INTEGER)
           AS hamming
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, hamming FROM h ORDER BY hamming ASC, vec_id ASC LIMIT 10
""",
        "emb_sq_topk": """
WITH q AS (
  SELECT list_transform(embedding::DOUBLE[],
           x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS qv
  FROM embeddings WHERE vec_id = 0
),
enc AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> greatest(0.0, least(255.0,
                round((x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                       + 1.0) / (2.0 / 255.0))))) AS b
  FROM embeddings
),
s AS (
  SELECT enc.vec_id,
         list_dot_product(q.qv,
           list_transform(enc.b, v -> -1.0 + (2.0 / 255.0) * v)) AS sc
  FROM enc CROSS JOIN q
)
SELECT vec_id, round(sc, 4) AS score FROM s
ORDER BY round(sc, 4) DESC, vec_id ASC LIMIT 10
""",
        "emb_knn_filtered": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS cos
            FROM embeddings
            WHERE label = 2
            ORDER BY round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) DESC,
                     vec_id ASC
            LIMIT 10
        """,
        "emb_ivf_full_probe": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 3)), 4) AS cos
            FROM embeddings
            ORDER BY round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 3)), 4) DESC,
                     vec_id ASC
            LIMIT 10
        """,
        "emb_pq_rerank_exact": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 3)), 4) AS cos
            FROM embeddings
            ORDER BY round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 3)), 4) DESC,
                     vec_id ASC
            LIMIT 10
        """,
        "emb_near_dups": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
                     AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
                  >= 0.30
        """,
    }
