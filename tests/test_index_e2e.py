"""End-to-end index tests: rank-identity vs the NumPy oracle, pruned ==
simple, forward-table reconstruction invariant, docid determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.oracle import build_oracle_index, score_query
from mysql_es_spark.operators.query import bm25_topk, direct_bm25
from mysql_es_spark.queryset import QUERY_SET
from tests.conftest import TEST_CFG

# subset for test speed; bench runs the full 40
RANK_QUERIES = [QUERY_SET[0], QUERY_SET[3], QUERY_SET[10], QUERY_SET[25], QUERY_SET[35], QUERY_SET[36]]


def _ranks_match(engine: list, oracle: list, eps: float = 1e-6) -> None:
    """Rank-identical comparison tolerant of ulp-level ties: docids must
    match position-by-position except inside groups of equal-to-eps scores,
    which may permute; scores must match within eps."""
    assert len(engine) == len(oracle)
    for (ed, es), (od, osc) in zip(engine, oracle):
        assert math.isclose(es, osc, abs_tol=eps), (ed, es, od, osc)
    i = 0
    while i < len(engine):
        j = i
        while j < len(oracle) and abs(oracle[j][1] - oracle[i][1]) <= eps:
            j += 1
        assert {d for d, _ in engine[i:j]} == {d for d, _ in oracle[i:j]}
        i = j


@pytest.fixture(scope="module")
def oracle_ix(spark, built_index):
    fwd = spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    return build_oracle_index([(r.docid, r.text) for r in fwd])


@pytest.mark.parametrize("q", RANK_QUERIES)
@pytest.mark.parametrize("k", [10, 100])
def test_rank_identity_simple(spark, built_index, oracle_ix, q, k):
    got = [
        (r.docid, r.score)
        for r in bm25_topk(spark, built_index, q, k=k, cfg=TEST_CFG, mode="simple").collect()
    ]
    want = score_query(oracle_ix, q, k)
    _ranks_match(got, want)


@pytest.mark.parametrize("q", RANK_QUERIES)
def test_pruned_equals_simple(spark, built_index, q):
    simple = [
        (r.docid, round(r.score, 9))
        for r in bm25_topk(spark, built_index, q, k=25, cfg=TEST_CFG, mode="simple").collect()
    ]
    pruned = [
        (r.docid, round(r.score, 9))
        for r in bm25_topk(spark, built_index, q, k=25, cfg=TEST_CFG, mode="pruned").collect()
    ]
    assert simple == pruned


def test_unknown_terms_empty(spark, built_index):
    assert bm25_topk(spark, built_index, "zzzzzzunknown", cfg=TEST_CFG).count() == 0
    assert bm25_topk(spark, built_index, "", cfg=TEST_CFG).count() == 0


def test_forward_reconstruction_invariant(spark, built_index, tiny_transcripts):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the per-row invariant from BASELINE.json input_hint."""
    src = tiny_transcripts.select("conv_id", "turn_idx", "text")
    fwd = spark.read.parquet(f"{built_index}/forward").select("conv_id", "turn_idx", "text")
    assert src.count() == fwd.count()
    diff = src.exceptAll(fwd)
    assert diff.count() == 0


def test_docids_unique_bucket_dense_deterministic(spark, built_index):
    from mysql_es_spark.operators.docids import bucket_capacity
    from tests.conftest import TEST_CFG

    cap = bucket_capacity(TEST_CFG.n_buckets)
    fwd = spark.read.parquet(f"{built_index}/forward")
    n = fwd.count()
    assert fwd.select("docid").distinct().count() == n
    # dense within each bucket's static range [bucket*cap, bucket*cap + n_b)
    per_bucket = fwd.groupBy("bucket").agg(
        F.min("docid").alias("lo"), F.max("docid").alias("hi"), F.count(F.lit(1)).alias("nb")
    )
    for r in per_bucket.collect():
        assert r["lo"] == r["bucket"] * cap
        assert r["hi"] == r["bucket"] * cap + r["nb"] - 1
    # a conversation's turns are contiguous, ascending with turn_idx
    w = fwd.groupBy("conv_id").agg(
        (F.max("docid") - F.min("docid") + 1).alias("span"), F.count(F.lit(1)).alias("n")
    )
    assert w.filter(F.col("span") != F.col("n")).count() == 0


def test_direct_bm25_matches_index_path(spark, built_index, oracle_ix):
    docs = spark.read.parquet(f"{built_index}/forward").select("docid", "text")
    got = direct_bm25(docs, "w0 w1", k=10, id_col="docid").collect()
    # direct_bm25's ordering contract is (round(score,4) desc, docid asc);
    # apply the same to the full oracle ranking before truncating to k
    full = score_query(oracle_ix, "w0 w1", oracle_ix.n_docs)
    want = sorted(full, key=lambda ds: (-round(ds[1], 4), ds[0]))[:10]
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, round(s, 4), abs_tol=2e-4)


def test_doc_lens_and_corpus_stats(spark, built_index, oracle_ix):
    stats = spark.read.parquet(f"{built_index}/corpus_stats").collect()[0]
    assert stats["n_docs"] == oracle_ix.n_docs
    assert math.isclose(stats["sum_dl"] / stats["n_docs"], oracle_ix.avgdl, rel_tol=1e-12)


@pytest.mark.parametrize("q", [QUERY_SET[0], QUERY_SET[10], QUERY_SET[35]])
def test_distributed_salt_selection_equals_simple(spark, built_index, q):
    """Force the 10^12-doc salt-selection path (no driver-side metadata
    pass) and require result identity with the exhaustive path."""
    cfg = TEST_CFG.with_(max_driver_salts=0)
    simple = [
        (r.docid, round(r.score, 9))
        for r in bm25_topk(spark, built_index, q, k=25, cfg=TEST_CFG, mode="simple").collect()
    ]
    dist = [
        (r.docid, round(r.score, 9))
        for r in bm25_topk(spark, built_index, q, k=25, cfg=cfg, mode="pruned").collect()
    ]
    assert simple == dist


def test_distributed_path_edge_probes(spark, built_index):
    cfg = TEST_CFG.with_(max_driver_salts=0)
    assert bm25_topk(spark, built_index, "zzznope", cfg=cfg, mode="pruned").count() == 0
    big = bm25_topk(spark, built_index, "w0", k=10**6, cfg=cfg, mode="pruned")
    assert big.count() > 0
