"""Physical-plan audits — the scale properties BENCH.md §4 claims, locked
in as tests so a regression (lost pushdown, lost broadcast, lost map-side
combine, blob column read in a metadata phase) fails CI instead of
silently costing 100× at production scale."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.operators.query import term_buckets_of
from mysql_es_spark.sources import tables as tbl
from tests.conftest import TEST_CFG


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_postings_metadata_read_prunes_everything(spark, built_index):
    """Phase-0 metadata reads must engage partition-dir pruning
    (term_bucket), row-group pruning (term), and column pruning (no blob)."""
    terms = ["w0", "w3"]
    buckets = sorted(set(term_buckets_of(spark, terms, TEST_CFG.term_buckets).values()))
    meta = (
        tbl.read(spark, built_index, "postings")
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("term", "salt", "n", "max_tf", "min_dl")
    )
    plan = plan_of(meta)
    assert "PushedFilters" in plan and "In(term" in plan
    assert "term_bucket" in plan.split("PartitionFilters")[1].splitlines()[0]
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "blob" not in read_schema
    assert "text" not in read_schema


def test_q1_shape_has_mapside_partial_agg(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )
    plan = plan_of(q)
    assert "partial_sum" in plan and "partial_count" in plan  # map-side combine
    assert plan.count("Exchange (") == 1  # exactly one shuffle
    # AQE's pre-execution formatted plan carries no WholeStageCodegen
    # annotation; the codegen claim is audited in BENCH.md from a live run
    assert "LessThanOrEqual(l_shipdate" in plan.split("PushedFilters")[1].splitlines()[0]


def test_dim_joins_broadcast_not_shuffle(spark):
    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet")
    c = spark.read.parquet(f"{sf}/customer.parquet")
    n = spark.read.parquet(f"{sf}/nation.parquet")
    r = spark.read.parquet(f"{sf}/region.parquet")
    q = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    plan = plan_of(q)
    assert plan.count("BroadcastHashJoin Inner BuildRight") == 3  # tree lines
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_projection_reaches_scan(spark):
    """A two-column projection must not read the other columns."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity")
    read_schema = plan_of(q).split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_term_dict_prefix_scan_pushes_startswith(spark, built_index):
    """prefix_topk's dictionary range scan: StartsWith reaches the parquet
    scan (row-group pruning over the range-sorted term_dict)."""
    q = (
        spark.read.parquet(f"{built_index}/term_dict")
        .filter(F.col("term").startswith("w1"))
        .select("term", "df")
    )
    plan = plan_of(q)
    assert "StringStartsWith(term,w1" in plan.split("PushedFilters")[1].splitlines()[0]
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "ttf" not in read_schema


def test_filtered_search_forward_scan_prunes(spark, built_index):
    """bm25_filtered_topk's forward-table side must push the structural
    predicate into the parquet scan and read only docid + the filter's
    columns — never text/blob — so the filter side stays a narrow
    columnar scan at 10^12 docs."""
    from mysql_es_spark.operators.query import bm25_filtered_topk

    df = bm25_filtered_topk(
        spark, built_index, "w0 w3", "role = 'assistant'", k=5, cfg=TEST_CFG
    )
    plan = plan_of(df)
    # the forward scan: the one whose pushed filters mention role
    fwd_scans = [
        seg for seg in plan.split("PushedFilters")[1:] if "role" in seg.splitlines()[0]
    ]
    assert fwd_scans, plan
    assert "EqualTo(role,assistant)" in fwd_scans[0].splitlines()[0]
    read_schema = fwd_scans[0].split("ReadSchema")[1].splitlines()[0]
    assert "text" not in read_schema and "blob" not in read_schema
    assert "docid" in read_schema and "role" in read_schema


def test_function_score_forward_scan_prunes_columns(spark, built_index):
    """function_score joins the forward table only for the modifier's
    columns — a gauss(ts) modifier must not drag text/role/tool into the
    scan (Catalyst column pruning through the join + expression)."""
    from mysql_es_spark.operators.query import function_score_topk, gauss_decay

    df = function_score_topk(
        spark, built_index, "w0 w3", gauss_decay("ts", "2026-01-05", 3.0),
        k=5, cfg=TEST_CFG,
    )
    plan = plan_of(df)
    fwd_reads = [
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema")[1:]
        if "ts" in seg.splitlines()[0]
    ]
    assert fwd_reads, plan
    for rs in fwd_reads:
        assert "text" not in rs and "role" not in rs and "doc_key" not in rs


def test_msearch_broadcasts_term_qid_mapping(spark, built_index):
    """The (term → qid) fan-out must be a broadcast join — the scored
    postings never shuffle to meet a 10-row mapping."""
    from mysql_es_spark.operators.query import bm25_topk_multi

    df = bm25_topk_multi(
        spark, built_index, {"a": "w0 w3", "b": "w1"}, k=5, cfg=TEST_CFG
    )
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # and a single partial/final hash agg pair on (qid, docid)
    assert "partial_sum" in plan


def test_aggs_cardinality_reads_only_needed_forward_cols(spark, built_index):
    from mysql_es_spark.operators import aggs

    df = aggs.cardinality(spark, built_index, "w0 w3", "tool", cfg=TEST_CFG)
    plan = plan_of(df)
    fwd_reads = [
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema")[1:]
        if "tool" in seg.splitlines()[0]
    ]
    assert fwd_reads, plan
    for rs in fwd_reads:
        assert "text" not in rs and "ts" not in rs


def test_suggest_dictionary_scan_never_touches_postings(spark, built_index):
    from mysql_es_spark.operators.query import suggest_terms

    df = suggest_terms(spark, built_index, "w00", size=3, max_edits=1)
    plan = plan_of(df)
    assert "postings" not in plan and "forward" not in plan
    assert "term_dict" in plan


def test_percolate_broadcasts_query_terms(spark, tiny_transcripts):
    """The stored-query term table must broadcast: the doc side (10^12
    rows at scale) never shuffles for percolation."""
    from mysql_es_spark.operators.percolate import percolate

    docs = tiny_transcripts.selectExpr("xxhash64(conv_id, turn_idx) AS doc_id", "text")
    plan = plan_of(percolate(spark, docs, [("q", "w0 w1", "all")]))
    assert "BroadcastHashJoin" in plan
    # the only SortMergeJoin-free path: no exchange of the tokenized docs
    # before the join (the groupBy after it is the single doc-side shuffle)
    assert plan.count("SortMergeJoin") == 0


def test_range_agg_single_pass(spark, built_index):
    """N requested ranges must compile to ONE conditional-count aggregate
    over one doc_lens scan — never a scan or union branch per range."""
    from mysql_es_spark.operators import aggs

    df = aggs.range_agg(
        spark, built_index, "w0 w3", [(None, 20), (20, 60), (60, None), (10, 30)],
        cfg=TEST_CFG,
    )
    plan = plan_of(df)
    # exactly ONE doc_lens scan node regardless of range count (4 here)
    dl_scans = [s for s in plan.split("Scan parquet") if "doc_lens" in s.split("ReadSchema")[0]]
    assert len(dl_scans) == 1, f"{len(dl_scans)} doc_lens scans for 4 ranges"
    assert "dl" in dl_scans[0].split("ReadSchema")[1].splitlines()[0]


def test_multi_match_term_dict_scans_prune(spark, tiny_transcripts, tmp_path_factory):
    """Each field's term_dict lookup must push the In(term) filter (row
    group pruning in the per-field dictionaries)."""
    import shutil

    from mysql_es_spark.plans.multi_field import build_multi_field, field_dir

    d = str(tmp_path_factory.mktemp("mfaudit") / "root")
    shutil.rmtree(d, ignore_errors=True)
    build_multi_field(
        spark, tiny_transcripts.limit(200), d, {"text": 1.0, "tool": 2.0}, TEST_CFG
    )
    dict_scan = (
        spark.read.parquet(f"{field_dir(d, 'text')}/term_dict")
        .filter(F.col("term").isin(["w0", "w3"]))
        .select("term", "df")
    )
    plan = plan_of(dict_scan)
    assert "PushedFilters" in plan and "In(term" in plan


def test_decontaminate_broadcasts_eval_shingles(spark, tiny_transcripts):
    """The eval side must collapse to a broadcast of its distinct shingle
    set — a shuffle join against a tiny eval suite is the wrong plan."""
    from mysql_es_spark.operators.dedup import decontaminate

    docs = tiny_transcripts.selectExpr("conv_id as doc_id", "text")
    out = decontaminate(docs, docs.limit(20), n=3)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # broadcast_eval=False stays correct (AQE may still pick broadcast for
    # a tiny side — that's its call, not a forced hint); equality of the
    # two paths is asserted in tests/test_decontaminate.py


def test_has_parent_broadcasts_parent_set(spark, built_index):
    """The bounded parent set must broadcast into the child fan-out join
    (never shuffle the full forward table on conv_id)."""
    from mysql_es_spark.operators.query import has_parent_topk

    out = has_parent_topk(spark, built_index, "w0 w3", k=10, cfg=TEST_CFG)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan


def test_agg_tree_forward_scan_prunes_columns(spark, built_index):
    """The forward scan under an agg tree must read only docid + the
    spec's bucket/metric fields (never text)."""
    from mysql_es_spark.operators.aggs import agg_tree

    spec = {
        "by_role": {
            "terms": {"field": "role", "size": 3},
            "aggs": {"by_tool": {"terms": {"field": "tool", "size": 2}}},
        }
    }
    out = agg_tree(spark, built_index, "w0 w3", spec, cfg=TEST_CFG)
    plan = plan_of(out)
    fwd_schemas = [
        seg for seg in plan.split("ReadSchema: ")[1:] if "role" in seg.split("\n")[0]
    ]
    assert fwd_schemas and all("text" not in seg.split("\n")[0] for seg in fwd_schemas)


def test_dis_max_single_decode_broadcast_fanout(spark, built_index):
    """dis_max must decode the union postings once (one postings scan,
    term_bucket partition pruning engaged) and fan contributions out to
    sub-queries via a broadcast join, never a shuffle against the
    tiny (term → sub) mapping."""
    from mysql_es_spark.operators.query import dis_max_topk

    df = dis_max_topk(
        spark, built_index, ["w0 w3", "w1 w0"], tie_breaker=0.4, k=5, cfg=TEST_CFG
    )
    plan = plan_of(df)
    assert "postings" in plan
    # exactly one parquet scan in the whole plan: the postings decode
    # (term_dict meta is a separate collect job; the mapping is local)
    locs = [ln for ln in plan.splitlines() if "Location:" in ln]
    assert len(locs) == 1 and "postings" in locs[0], locs
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "term_bucket" in plan  # partition-dir pruning reached the scan


def test_rank_eval_judgements_broadcast(spark, built_index):
    """rank_eval joins hits against the judgement set broadcast-side and
    computes ideal-DCG with a per-qid (partitioned, never global) window."""
    from mysql_es_spark.operators.rankeval import rank_eval

    df = rank_eval(
        spark, built_index, {"q": ("w0 w3", {1: 2, 2: 1})}, k=5, cfg=TEST_CFG, key="docid"
    )
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # no WindowExec without a partition key (global sort) anywhere
    for ln in plan.splitlines():
        if "Window" in ln and "partitionBy" in ln:
            assert "qid" in ln


def test_constant_score_never_reads_positions(spark, built_index):
    """constant_score is a presence-only decode: the plan must read the
    posting blob (to get docids) but never the positions payload, and the
    term filter must push down."""
    from mysql_es_spark.operators.query import constant_score_topk

    plan = plan_of(
        constant_score_topk(spark, built_index, "w0 w3", k=5, cfg=TEST_CFG)
    )
    postings_reads = [
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema")[1:]
        if "blob" in seg.splitlines()[0]
    ]
    assert postings_reads, "expected a postings scan"
    assert all("pos_blob" not in r for r in postings_reads)
    assert "In(term" in plan


def test_exists_pushes_isnotnull(spark, built_index):
    from mysql_es_spark.operators.query import exists_topk

    plan = plan_of(exists_topk(spark, built_index, "tool", k=5, cfg=TEST_CFG))
    assert "IsNotNull(tool)" in plan
    # two-column scan only: docid + the probed field
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "text" not in read and "conv_id" not in read


def test_completion_suggest_startswith_pushdown(spark, built_index):
    from mysql_es_spark.operators.query import suggest_completion

    plan = plan_of(suggest_completion(spark, built_index, "w1", size=5))
    assert "StringStartsWith(term" in plan
    assert "blob" not in plan  # dictionary only, postings never scanned


def test_terms_set_per_doc_threshold_prunes_forward(spark, built_index):
    """The msm_expr join must read only docid + the expression's input
    column from the forward table."""
    from mysql_es_spark.operators.query import terms_set_topk

    plan = plan_of(
        terms_set_topk(
            spark, built_index, ["w0", "w3", "w5"],
            msm_expr="1 + pmod(turn_idx, 2)", k=5, cfg=TEST_CFG,
        )
    )
    fwd_reads = [
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema")[1:]
        if "turn_idx" in seg.splitlines()[0]
    ]
    assert fwd_reads, "expected a forward scan for the threshold column"
    assert all("text" not in r for r in fwd_reads)


def test_matrix_stats_single_pass_partial_agg(spark, built_index):
    """matrix_stats must be ONE map-side-combined hash agg over power
    sums (single shuffle of an 11-column sum row), with the forward scan
    pruned to docid+text."""
    from mysql_es_spark.operators import aggs

    df = aggs.matrix_stats_agg(spark, built_index, "w0 w3", cfg=TEST_CFG)
    plan = plan_of(df)
    assert "partial_sum" in plan  # map-side combine of the power sums
    # the forward read feeding y must not drag role/tool/ts along
    fwd_reads = [
        seg.split("ReadSchema")[1].splitlines()[0]
        for seg in plan.split("Scan parquet")[1:]
        if "/forward" in seg and "ReadSchema" in seg
    ]
    assert fwd_reads, plan
    for rs in fwd_reads:
        assert "text" in rs and "role" not in rs and "tool" not in rs


def test_string_stats_entropy_collapses_mapside(spark, built_index):
    """The character explode must collapse to (char, count) partials on
    the map side — only ≤|alphabet| keys per task cross the shuffle."""
    from mysql_es_spark.operators import aggs

    df = aggs.string_stats(spark, built_index, "w0 w3", cfg=TEST_CFG)
    plan = plan_of(df)
    assert "partial_count" in plan or "partial_sum" in plan


def test_cumulative_cardinality_first_occurrence_is_hash_agg(spark, built_index):
    """cumulative_cardinality's heavy stage is the value-keyed min(period)
    hash agg (map-side combined); the single-partition window sees only
    bucket-count rows."""
    from mysql_es_spark.operators import aggs

    df = aggs.cumulative_cardinality_agg(spark, built_index, "w0 w3", cfg=TEST_CFG)
    plan = plan_of(df)
    assert "partial_min" in plan  # first-occurrence assignment combines map-side
    fwd_reads = [
        seg.split("ReadSchema")[1].splitlines()[0]
        for seg in plan.split("Scan parquet")[1:]
        if "/forward" in seg and "ReadSchema" in seg
    ]
    assert fwd_reads, plan
    for rs in fwd_reads:
        assert "text" not in rs


def test_sparse_vector_weights_skip_term_dict(spark, built_index):
    """sparse_vector weights replace idf, so its simple-mode plan must
    never read term_dict (no df lookup job) — only the postings scan."""
    from mysql_es_spark.operators.query import sparse_vector_topk

    df = sparse_vector_topk(
        spark, built_index, {"w0": 2.0, "w3": 0.5}, k=5, cfg=TEST_CFG, mode="simple"
    )
    plan = plan_of(df)
    assert "postings" in plan
    assert "term_dict" not in plan


def test_intervals_filter_blocks_scan_prunes_terms(spark, tiny_transcripts, tmp_path_factory):
    """The span-relation kernel's postings scan must push the In(term)
    filter down (row-group pruning) and restrict to the source salts."""
    from mysql_es_spark.operators.query import intervals_filter_topk
    from mysql_es_spark.plans.build import build_index

    cfg = TEST_CFG.with_(with_positions=True)
    d = str(tmp_path_factory.mktemp("ivf_audit") / "ix")
    build_index(spark, tiny_transcripts, d, cfg)
    df = intervals_filter_topk(spark, d, "w0", "before", "w3", k=5, cfg=cfg)
    plan = plan_of(df)
    assert "PushedFilters" in plan and "term" in plan


def test_dsir_weight_table_broadcasts(spark, tiny_transcripts):
    """The B-row bucket-weight table must broadcast into the per-token
    join (a shuffle join against a 1k-row table is the wrong plan), and
    the plan must never sort or window the corpus-sized token frame."""
    from mysql_es_spark.operators.sampling import dsir_logweights

    docs = tiny_transcripts.selectExpr("xxhash64(conv_id, turn_idx) as doc_id", "text")
    out = dsir_logweights(docs, F.col("text").contains("w0"), n_buckets=256)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan and "GlobalSort" not in plan


def test_temperature_mix_counts_broadcast(spark, tiny_transcripts):
    """The per-stratum epoch table (|strata| rows) must broadcast back
    onto the data rows — the data itself is never shuffled."""
    from mysql_es_spark.operators.sampling import temperature_mix

    docs = tiny_transcripts.selectExpr("xxhash64(conv_id, turn_idx) as doc_id", "role")
    plan = plan_of(temperature_mix(docs, "role", tau=0.7, id_col="doc_id"))
    assert "BroadcastHashJoin" in plan
    # the only exchanges are for the tiny strata-count agg, never a
    # repartition of the data rows on a data column
    assert "hashpartitioning(doc_id" not in plan


def test_parent_id_pushes_conv_filter(spark, built_index):
    """parent_id is a structural point lookup: the conv_id equality must
    reach the forward parquet scan as a pushed filter, and postings must
    never be read."""
    from mysql_es_spark.operators.query import parent_id_topk

    plan = plan_of(parent_id_topk(spark, built_index, "c42", k=10))
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "EqualTo(conv_id" in pushed
    assert "postings" not in plan


def test_export_slice_adds_no_exchange(spark, built_index):
    """Slicing is a fused filter, not a repartition: the sliced plan must
    have exactly as many exchanges as the unsliced export."""
    from mysql_es_spark.operators.query import match_export

    base = plan_of(match_export(spark, built_index, "w0 w3", cfg=TEST_CFG, with_keys=True))
    sliced = plan_of(
        match_export(
            spark, built_index, "w0 w3", cfg=TEST_CFG, with_keys=True,
            slice_id=1, slice_max=3,
        )
    )
    assert sliced.count("Exchange (") == base.count("Exchange (")


def test_collapse_inner_hits_groups_broadcast_semi(spark, built_index):
    """The <=k winning group keys must broadcast into the expansion
    semi-join (never re-shuffle the scored frame for membership)."""
    from mysql_es_spark.operators.query import bm25_collapse_topk

    out = bm25_collapse_topk(
        spark, built_index, "w0 w3", "role", k=2, cfg=TEST_CFG,
        order_round=4, inner_hits=3,
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_sorted_search_prunes_text_and_takeordered(spark, built_index):
    """sorted_search must never read the text column (sort fields + keys
    only) and must realize its top-k as TakeOrdered, not a global sort."""
    from mysql_es_spark.operators.query import sorted_search

    q = sorted_search(
        spark, built_index, "w0 w3", [("role", "asc"), ("ts", "desc")],
        size=7, search_after=["user", None, 0], cfg=TEST_CFG,
    )
    plan = plan_of(q)
    fwd_schemas = [
        seg.splitlines()[0] for seg in plan.split("ReadSchema")[1:] if "role" in seg.splitlines()[0]
    ]
    assert fwd_schemas, "forward scan present"
    assert all("text" not in s for s in fwd_schemas), "text column must be pruned"
    assert "TakeOrderedAndProject" in plan, "top-k must not be a global sort"


def test_seeded_shuffle_writer_is_one_range_exchange(spark, tiny_transcripts):
    from mysql_es_spark.operators.sampling import seeded_shuffle

    df = tiny_transcripts.select("conv_id").distinct()
    keyed = (
        seeded_shuffle(df, "ep1", id_col="conv_id")
        .repartitionByRange(4, F.col("shuffle_key"), F.col("conv_id"))
        .sortWithinPartitions("shuffle_key", "conv_id")
    )
    plan = plan_of(keyed)
    # formatted explain separates the node name from its arguments
    assert plan.count("rangepartitioning(shuffle_key") == 1
    # Sort node arguments: [...keys...], <global>, 0 — must be local (false)
    assert "Arguments: [shuffle_key" in plan and "], false, 0" in plan


def test_filtered_alias_pushes_predicate(spark, built_index, tmp_path_factory):
    """bm25_topk through a FILTERED alias must compile to the same shape
    as explicit filter-context search: predicate pushed into the forward
    parquet scan, no text/blob read on the filter side."""
    from mysql_es_spark.operators.query import bm25_topk
    from mysql_es_spark.plans.alias import set_alias

    alias = str(tmp_path_factory.mktemp("pa_alias") / "flt")
    set_alias(alias, built_index, doc_filter="role = 'assistant'")
    plan = plan_of(bm25_topk(spark, alias, "w0 w3", k=5, cfg=TEST_CFG))
    fwd_scans = [
        seg for seg in plan.split("PushedFilters")[1:] if "role" in seg.splitlines()[0]
    ]
    assert fwd_scans, plan
    assert "EqualTo(role,assistant)" in fwd_scans[0].splitlines()[0]
    read_schema = fwd_scans[0].split("ReadSchema")[1].splitlines()[0]
    assert "text" not in read_schema and "blob" not in read_schema


def test_chunk_documents_has_no_shuffle(spark, tiny_transcripts):
    """chunk_documents is one Arrow pass + JVM array expressions — the
    plan must contain no Exchange at all."""
    from mysql_es_spark.operators.packing import chunk_documents

    df = tiny_transcripts.select(F.col("conv_id").alias("doc_id"), "text")
    plan = plan_of(chunk_documents(df, chunk=16, stride=8, id_col="doc_id"))
    assert "Exchange" not in plan, plan


def test_minhash_signatures_have_no_shuffle(spark, tiny_transcripts):
    """The set-form signature path (round 3) must stay shuffle-free:
    shingling/hashing collapse into one projection and the kernel maps
    complete per-doc rows, so the plan has no Exchange. The 12M-doc
    stress died twice on ENOSPC under the exploded row pipeline — this
    locks the fix in."""
    from mysql_es_spark.operators.dedup import minhash_signatures

    docs = tiny_transcripts.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
    )
    for bh in ("xxhash64", "md5"):
        plan = plan_of(minhash_signatures(docs, base_hash=bh))
        assert "Exchange" not in plan, plan


def test_minhash_verify_ships_arrays_not_shingle_rows(spark, tiny_transcripts):
    """minhash_lsh_pairs' exact-verify stage must join id-keyed ARRAY
    sets (one row per candidate side, array_intersect in the JVM), never
    re-explode shingles into per-row fan-out. The explode may appear only
    once — in _banded_df's band expansion, which emits `bands` short rows
    per doc."""
    from mysql_es_spark.operators.dedup import minhash_lsh_pairs

    docs = tiny_transcripts.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
    )
    plan = plan_of(minhash_lsh_pairs(docs, threshold=0.5))
    assert "array_intersect" in plan, plan
    # lock the docstring's real invariant: every Generate (explode) in
    # the plan is _banded_df's band expansion (bands short rows/doc) — a
    # reintroduced exploded-row verify would add a per-SHINGLE Generate.
    # The band subtree legitimately repeats across self-join branches, so
    # check the generator expression, not the node count.
    import re as _re

    gen_ids = _re.findall(r"\((\d+)\) Generate", plan)
    assert gen_ids, plan
    for gid in gen_ids:
        detail = plan.split(f"({gid}) Generate", 1)[1].split("\n\n")[0]
        assert "band_idx" in detail, f"non-banding explode in plan:\n{detail}"
    # and no per-shingle column survives anywhere in the physical plan
    assert "shingle#" not in plan, plan
