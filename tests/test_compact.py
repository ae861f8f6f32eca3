"""Segment compaction: a compacted index must answer every query with
the same ranking as the multi-wave source (scores equal to float-sum
reordering, ~1 ulp) while never increasing block count, with all side
tables (forward, doc_lens, corpus_stats, lineage, index_meta) intact."""

from __future__ import annotations

import math

import pytest

from mysql_es_spark import corpus
from mysql_es_spark.config import IndexConfig
from mysql_es_spark.operators.query import (
    bm25_filtered_topk,
    bm25_topk,
    corpus_stats,
    phrase_topk,
)
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.plans.compact import compact_index
from tests.conftest import TEST_CFG

QUERIES = ["w0 w3", "w1 w5 w20", "w250", "cafe w1"]


@pytest.fixture(scope="module")
def compacted(spark, built_index, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("compact") / "ix")
    stats = compact_index(spark, built_index, dst)
    return dst, stats


def test_compaction_reduces_blocks(compacted):
    _, stats = compacted
    assert stats["blocks_after"] <= stats["blocks_before"]
    assert stats["blocks_after"] > 0 and stats["n_docs"] > 0


def test_compacted_single_wave(spark, compacted):
    dst, _ = compacted
    waves = spark.read.parquet(f"{dst}/postings").select("wave").distinct().collect()
    assert [r.wave for r in waves] == [0]


@pytest.mark.parametrize("q", QUERIES)
def test_compacted_rank_identity(spark, built_index, compacted, q):
    dst, _ = compacted
    for mode in ("simple", "pruned"):
        src_rows = bm25_topk(spark, built_index, q, k=15, cfg=TEST_CFG, mode=mode).collect()
        dst_rows = bm25_topk(spark, dst, q, k=15, cfg=TEST_CFG, mode=mode).collect()
        # float-sum order over a doc's term contributions changes with the
        # physical layout, so scores agree to ~1 ulp, not bit-exactly
        assert [r.docid for r in src_rows] == [r.docid for r in dst_rows]
        for a, b in zip(src_rows, dst_rows):
            assert math.isclose(a.score, b.score, rel_tol=1e-12)


def test_compacted_corpus_stats_equal(spark, built_index, compacted):
    dst, _ = compacted
    assert corpus_stats(spark, built_index) == corpus_stats(spark, dst)


def test_compacted_filtered_search_forward_intact(spark, built_index, compacted):
    dst, _ = compacted
    src = bm25_filtered_topk(
        spark, built_index, "w0 w3", "role = 'assistant'", k=10, cfg=TEST_CFG,
        with_keys=True,
    ).collect()
    got = bm25_filtered_topk(
        spark, dst, "w0 w3", "role = 'assistant'", k=10, cfg=TEST_CFG, with_keys=True
    ).collect()
    assert [(r.docid, r.doc_key, r.text) for r in src] == [
        (r.docid, r.doc_key, r.text) for r in got
    ]
    for a, b in zip(src, got):
        assert math.isclose(a.score, b.score, rel_tol=1e-12)


def test_compacted_positional_phrase(spark, tmp_path_factory):
    """Positional blobs survive the decode→re-encode round trip."""
    cfg = IndexConfig(
        n_buckets=4, wave_size=1, salt_docs=128, term_buckets=4, block_size=32,
        with_positions=True,
    )
    df = corpus.transcripts_df(spark, 800, seed=99)
    src = str(tmp_path_factory.mktemp("cpos") / "src")
    dst = str(tmp_path_factory.mktemp("cpos") / "dst")
    build_index(spark, df, src, cfg)
    stats = compact_index(spark, src, dst)
    assert stats["blocks_after"] <= stats["blocks_before"]
    for q in ("w0 w1", "w12 w3"):
        src_rows = phrase_topk(spark, src, q, k=10, cfg=cfg).collect()
        dst_rows = phrase_topk(spark, dst, q, k=10, cfg=cfg).collect()
        assert [r.docid for r in src_rows] == [r.docid for r in dst_rows]
        for a, b in zip(src_rows, dst_rows):
            assert math.isclose(a.score, b.score, rel_tol=1e-12)


@pytest.fixture(scope="module")
def resharded(spark, built_index, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("reshard") / "ix")
    stats = compact_index(
        spark, built_index, dst,
        reshard={"salt_docs": 64, "term_buckets": 4, "block_size": 32},
    )
    return dst, stats


def test_reshard_new_layout_persisted(spark, resharded):
    from mysql_es_spark.operators.query import effective_config

    dst, _ = resharded
    eff = effective_config(spark, dst, None)
    assert (eff.salt_docs, eff.term_buckets, eff.block_size) == (64, 4, 32)
    # physical reality matches the persisted meta
    buckets = {
        r.term_bucket
        for r in spark.read.parquet(f"{dst}/postings").select("term_bucket").distinct().collect()
    }
    assert buckets <= set(range(4)) and buckets
    bad = spark.read.parquet(f"{dst}/postings").filter("n > 32").count()
    assert bad == 0


@pytest.mark.parametrize("q", QUERIES)
def test_reshard_rank_identity(spark, built_index, resharded, q):
    dst, _ = resharded
    src = [
        (r.docid, round(r.score, 9))
        for r in bm25_topk(spark, built_index, q, k=15, cfg=TEST_CFG, mode="simple").collect()
    ]
    for mode in ("simple", "pruned"):
        # no cfg passed: the resharded meta must drive the salt/bucket math
        got = [
            (r.docid, round(r.score, 9))
            for r in bm25_topk(spark, dst, q, k=15, mode=mode).collect()
        ]
        assert got == src, (mode, q)


def test_reshard_rejects_non_physical_keys(spark, built_index, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("reshardbad") / "ix")
    with pytest.raises(ValueError):
        compact_index(spark, built_index, dst, reshard={"n_buckets": 2})
    with pytest.raises(ValueError):
        compact_index(spark, built_index, dst, reshard={"with_positions": True})
