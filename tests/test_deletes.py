"""Soft deletes: delete_by_query masking, ES pre-merge scoring semantics,
idempotence, and physical purge on compaction (post-merge score shift)."""

from __future__ import annotations

import math
import shutil

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.oracle import build_oracle_index, score_query
from mysql_es_spark.operators.query import (
    bm25_topk,
    bm25_topk_conjunctive,
    match_aggregate,
    phrase_topk,
)
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.plans.compact import compact_index
from mysql_es_spark.plans.deletes import delete_by_query
from mysql_es_spark.corpus import transcripts_df
from mysql_es_spark.config import IndexConfig
from tests.conftest import TEST_CFG

Q = "w0 w3"
DEL_Q = "w7"  # soft-delete every doc containing this term


@pytest.fixture(scope="module")
def del_index(spark, tiny_transcripts, tmp_path_factory):
    """A fresh index (module-private — mutated by deletes) + its rows."""
    d = str(tmp_path_factory.mktemp("delix") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, tiny_transcripts, d, TEST_CFG)
    rows = (
        spark.read.parquet(f"{d}/forward").select("docid", "role", "text").collect()
    )
    n = delete_by_query(spark, d, DEL_Q, cfg=TEST_CFG)
    deleted = {
        r.docid for r in rows if set(tokenize_text(r.text)) & {DEL_Q}
    }
    assert n == len(deleted) > 0
    return d, rows, deleted


def test_masked_from_topk_scores_unchanged(spark, del_index):
    """Deleted docs vanish from hits but surviving scores keep counting
    them in idf/avgdl — ES scores exactly this way until a merge."""
    d, rows, deleted = del_index
    oix = build_oracle_index([(r.docid, r.text) for r in rows])  # FULL corpus stats
    full = score_query(oix, Q, k=len(rows))
    want = [(doc, s) for doc, s in full if doc not in deleted][:12]
    for mode in ("simple", "pruned"):
        got = bm25_topk(spark, d, Q, k=12, cfg=TEST_CFG, mode=mode).collect()
        assert [r.docid for r in got] == [doc for doc, _ in want], mode
        for r, (_, s) in zip(got, want):
            assert math.isclose(r.score, s, abs_tol=1e-9)


def test_masked_from_conjunctive_and_phrase(spark, del_index):
    d, rows, deleted = del_index
    for df in (
        bm25_topk_conjunctive(spark, d, Q, k=50, cfg=TEST_CFG),
        phrase_topk(spark, d, "w0 w1", k=50, cfg=TEST_CFG)
        if TEST_CFG.with_positions
        else None,
    ):
        if df is None:
            continue
        assert not ({r.docid for r in df.collect()} & deleted)


def test_masked_from_aggregates(spark, del_index):
    d, rows, deleted = del_index
    qt = {t for t in tokenize_text(DEL_Q)}
    matched_live = {
        r.docid
        for r in rows
        if set(tokenize_text(r.text)) & {"w0", "w3"} and r.docid not in deleted
    }
    out = match_aggregate(spark, d, Q, ["role"], cfg=TEST_CFG).collect()
    assert sum(r.n_docs for r in out) == len(matched_live)


def test_delete_idempotent_and_filter_variant(spark, del_index):
    d, rows, deleted = del_index
    assert delete_by_query(spark, d, DEL_Q, cfg=TEST_CFG) == 0  # re-run: no-op
    # predicate-only delete: one specific live doc
    live_doc = next(r.docid for r in rows if r.docid not in deleted)
    n = delete_by_query(spark, d, doc_filter=f"docid = {live_doc}", cfg=TEST_CFG)
    assert n == 1
    assert delete_by_query(spark, d, doc_filter=f"docid = {live_doc}", cfg=TEST_CFG) == 0
    got = {r.docid for r in bm25_topk(spark, d, Q, k=10_000, cfg=TEST_CFG).collect()}
    assert live_doc not in got


def test_purge_on_compact_shifts_stats(spark, del_index, tmp_path_factory):
    """After the merge the deleted docs are physically gone: scores equal a
    from-scratch oracle over the surviving docs only (idf/avgdl shift)."""
    d, rows, deleted = del_index
    # include the filter-deleted doc from the previous test if it ran first
    from mysql_es_spark.operators.query import deleted_docids

    all_deleted = {r.docid for r in deleted_docids(spark, d).collect()}
    dst = str(tmp_path_factory.mktemp("delix_compact") / "ix")
    stats = compact_index(spark, d, dst)
    assert stats["docs_purged"] == len(all_deleted)
    assert stats["n_docs"] == len(rows) - len(all_deleted)

    survivors = [(r.docid, r.text) for r in rows if r.docid not in all_deleted]
    oix = build_oracle_index(survivors)  # purged corpus stats
    want = score_query(oix, Q, k=15)
    got = bm25_topk(spark, dst, Q, k=15, cfg=TEST_CFG, mode="pruned").collect()
    assert [r.docid for r in got] == [doc for doc, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)
    # physically gone, not masked: no deletes table in the new index
    import os

    assert not os.path.isdir(os.path.join(dst, "deletes"))


def test_compact_without_purge_keeps_mask(spark, del_index, tmp_path_factory):
    d, rows, deleted = del_index
    from mysql_es_spark.operators.query import deleted_docids

    all_deleted = {r.docid for r in deleted_docids(spark, d).collect()}
    dst = str(tmp_path_factory.mktemp("delix_nopurge") / "ix")
    stats = compact_index(spark, d, dst, purge_deletes=False)
    assert stats["docs_purged"] == 0
    got = {r.docid for r in bm25_topk(spark, dst, Q, k=10_000, cfg=TEST_CFG).collect()}
    assert not (got & all_deleted)  # mask rode along
    # and scores still use full-corpus stats (byte-identical contract)
    oix = build_oracle_index([(r.docid, r.text) for r in rows])
    full = score_query(oix, Q, k=len(rows))
    want = [(doc, s) for doc, s in full if doc not in all_deleted][:10]
    top = bm25_topk(spark, dst, Q, k=10, cfg=TEST_CFG).collect()
    assert [r.docid for r in top] == [doc for doc, _ in want]


def test_incremental_rebuild_clears_stale_deletes(spark, tmp_path_factory):
    """CDC semantics: re-indexing a conversation makes its soft-deleted
    turns live again (snapshot truth wins); deletes in untouched buckets
    survive the batch."""
    from mysql_es_spark.corpus import transcripts_df
    from mysql_es_spark.operators.query import bm25_topk, deleted_docids
    from mysql_es_spark.streaming.incremental import incremental_update
    from mysql_es_spark.sources.tables import local_rows_df

    d = str(tmp_path_factory.mktemp("cdc_del") / "ix")
    snap = transcripts_df(spark, 600, seed=9).cache()
    build_index(spark, snap, d, TEST_CFG)
    fwd = spark.read.parquet(f"{d}/forward").select(
        "docid", "conv_id", "bucket", "text"
    ).collect()
    # pick two docs in different buckets, delete both
    by_bucket = {}
    for r in fwd:
        by_bucket.setdefault(r.bucket, r)
    b1, b2 = sorted(by_bucket)[:2]
    d1, d2 = by_bucket[b1], by_bucket[b2]
    delete_by_query(spark, d, doc_filter=f"docid IN ({d1.docid}, {d2.docid})", cfg=TEST_CFG)
    assert {r.docid for r in deleted_docids(spark, d).collect()} == {d1.docid, d2.docid}

    # CDC batch touches only d1's conversation → only bucket b1 rebuilds
    changed = local_rows_df(spark, [(d1.conv_id,)], "conv_id string")
    res = incremental_update(spark, snap, changed, d, TEST_CFG, batch_id=7)
    assert b1 in res["buckets"] and b2 not in res["buckets"]

    left = {r.docid for r in deleted_docids(spark, d).collect()}
    assert left == {d2.docid}  # d1 resurrected, d2 still masked
    hits = {r.docid for r in bm25_topk(spark, d, "w0 w1 w2 w3", k=10_000, cfg=TEST_CFG).collect()}
    assert d2.docid not in hits


def test_purge_on_compact_positional_index(spark, tiny_transcripts, tmp_path_factory):
    """Purge must survive the positional layout: pos_blobs re-encode from
    the surviving postings and phrase queries stay correct afterwards."""
    from mysql_es_spark.operators.query import phrase_topk

    cfg = IndexConfig(
        n_buckets=4, wave_size=2, salt_docs=256, term_buckets=8, block_size=64,
        with_positions=True,
    )
    d = str(tmp_path_factory.mktemp("posdel") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, tiny_transcripts, d, cfg)
    rows = spark.read.parquet(f"{d}/forward").select("docid", "text").collect()
    n = delete_by_query(spark, d, "w9", cfg=cfg)
    assert n > 0
    dst = str(tmp_path_factory.mktemp("posdel_c") / "ix")
    stats = compact_index(spark, d, dst)
    assert stats["docs_purged"] == n

    deleted = {r.docid for r in rows if "w9" in set(tokenize_text(r.text))}
    hits = {r.docid for r in phrase_topk(spark, dst, "w0 w1", k=10_000, cfg=cfg).collect()}
    want = {
        r.docid
        for r in rows
        if r.docid not in deleted
        and any(
            tokenize_text(r.text)[i : i + 2] == ["w0", "w1"]
            for i in range(len(tokenize_text(r.text)) - 1)
        )
    }
    assert hits == want
