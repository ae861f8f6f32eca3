"""_reindex: subset selection, deletes never cross, config change
(positions on), and rank identity of the new index."""

from __future__ import annotations

import math

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.oracle import build_oracle_index, score_query
from mysql_es_spark.operators.query import bm25_topk, phrase_topk
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.plans.deletes import delete_by_query, reindex
from tests.conftest import TEST_CFG


@pytest.fixture(scope="module")
def src(spark, tiny_transcripts, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("reix_src") / "ix")
    build_index(spark, tiny_transcripts, d, TEST_CFG)
    rows = spark.read.parquet(f"{d}/forward").select("docid", "doc_key", "text").collect()
    return d, rows


def test_reindex_query_subset_rank_identity(spark, src, tmp_path_factory):
    d, rows = src
    dst = str(tmp_path_factory.mktemp("reix_q") / "ix")
    stats = reindex(spark, d, dst, query="w5")
    keep = [(r.doc_key, r.text) for r in rows if "w5" in set(tokenize_text(r.text))]
    assert stats["docs_selected"] == len(keep) > 0
    # rank identity on the new index: oracle over the SUBSET (fresh stats)
    fwd2 = spark.read.parquet(f"{dst}/forward").select("docid", "doc_key", "text").collect()
    assert {r.doc_key for r in fwd2} == {k for k, _ in keep}
    oix = build_oracle_index([(r.docid, r.text) for r in fwd2])
    want = score_query(oix, "w0 w5", k=10)
    got = bm25_topk(spark, dst, "w0 w5", k=10, cfg=TEST_CFG, mode="pruned").collect()
    assert [r.docid for r in got] == [doc for doc, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)


def test_reindex_drops_soft_deletes_and_honors_filter(spark, src, tmp_path_factory):
    d, rows = src
    victim = rows[0]
    delete_by_query(spark, d, doc_filter=f"docid = {victim.docid}", cfg=TEST_CFG)
    dst = str(tmp_path_factory.mktemp("reix_f") / "ix")
    reindex(spark, d, dst, doc_filter="turn_idx >= 0")  # select-all predicate
    keys2 = {
        r.doc_key for r in spark.read.parquet(f"{dst}/forward").select("doc_key").collect()
    }
    assert victim.doc_key not in keys2
    assert len(keys2) == len(rows) - 1
    import os

    assert not os.path.isdir(os.path.join(dst, "deletes"))


def test_reindex_into_new_settings(spark, src, tmp_path_factory):
    """Reindex a positionless index into a positional layout — phrase
    queries work on the destination (re-tokenized from stored source)."""
    d, rows = src
    dst = str(tmp_path_factory.mktemp("reix_pos") / "ix")
    pos_cfg = IndexConfig(
        n_buckets=4, wave_size=2, salt_docs=256, term_buckets=8, block_size=64,
        with_positions=True,
    )
    reindex(spark, d, dst, query="w0", dst_cfg=pos_cfg)
    hits = phrase_topk(spark, dst, "w0 w1", k=10_000, cfg=pos_cfg).collect()
    want = {
        r.docid
        for r in spark.read.parquet(f"{dst}/forward").select("docid", "text").collect()
        if any(
            tokenize_text(r.text)[i : i + 2] == ["w0", "w1"]
            for i in range(len(tokenize_text(r.text)) - 1)
        )
    }
    assert {r.docid for r in hits} == want


def test_reindex_no_match_is_empty_index(spark, src, tmp_path_factory):
    d, _ = src
    dst = str(tmp_path_factory.mktemp("reix_e") / "ix")
    stats = reindex(spark, d, dst, query="zzznope")
    assert stats["docs_selected"] == 0
    assert bm25_topk(spark, dst, "w0", k=5, cfg=TEST_CFG).count() == 0
