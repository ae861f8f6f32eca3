"""_termvectors: per-doc term/tf/positions straight from the index."""

from __future__ import annotations

from collections import Counter

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import term_vectors, term_vectors_multi
from tests.conftest import TEST_CFG


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    return {r.docid: r.text for r in rows}


def test_term_vectors_match_tokenizer(spark, built_index, fwd):
    target = max((d for d, t in fwd.items() if t), key=lambda d: len(fwd[d]))
    want = Counter(tokenize_text(fwd[target]))
    got = {r.term: r.tf for r in term_vectors(spark, built_index, target, cfg=TEST_CFG).collect()}
    assert got == dict(want)


def test_term_vectors_positions(spark, tiny_transcripts, tmp_path_factory):
    import shutil

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.plans.build import build_index

    cfg = IndexConfig(
        n_buckets=4, wave_size=2, salt_docs=256, term_buckets=8, block_size=64,
        with_positions=True,
    )
    d = str(tmp_path_factory.mktemp("tvix") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, tiny_transcripts, d, cfg)
    rows = spark.read.parquet(f"{d}/forward").select("docid", "text").collect()
    target = next(r for r in rows if r.text and len(tokenize_text(r.text)) > 3)
    toks = tokenize_text(target.text)
    want = {}
    for i, t in enumerate(toks):
        want.setdefault(t, []).append(i)
    got = {
        r.term: list(r.positions)
        for r in term_vectors(spark, d, target.docid, cfg=cfg).collect()
    }
    assert got == want


def test_mtermvectors_matches_per_doc(spark, built_index, fwd):
    targets = sorted(d for d, t in fwd.items() if t)[:5]
    got = {}
    for r in term_vectors_multi(spark, built_index, targets, cfg=TEST_CFG).collect():
        got.setdefault(r.docid, {})[r.term] = r.tf
    assert set(got) == set(targets)
    for d in targets:
        want = {
            r.term: r.tf
            for r in term_vectors(spark, built_index, d, cfg=TEST_CFG).collect()
        }
        assert got[d] == want


def test_mtermvectors_positions_and_deletes(spark, tiny_transcripts, tmp_path_factory):
    import shutil

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.plans.deletes import delete_by_query

    cfg = IndexConfig(
        n_buckets=4, wave_size=2, salt_docs=256, term_buckets=8, block_size=64,
        with_positions=True,
    )
    d = str(tmp_path_factory.mktemp("mtvix") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, tiny_transcripts, d, cfg)
    rows = spark.read.parquet(f"{d}/forward").select("docid", "text").collect()
    picks = [r for r in rows if r.text and len(tokenize_text(r.text)) > 2][:3]
    want = {}
    for r in picks:
        per = {}
        for i, t in enumerate(tokenize_text(r.text)):
            per.setdefault(t, []).append(i)
        want[r.docid] = per
    out = term_vectors_multi(spark, d, [r.docid for r in picks], cfg=cfg)
    got = {}
    for r in out.collect():
        got.setdefault(r.docid, {})[r.term] = list(r.positions)
    assert got == want
    # deleting one of the docs drops exactly its rows
    victim = picks[0].docid
    delete_by_query(spark, d, doc_filter=f"docid = {victim}", cfg=cfg)
    left = {
        r.docid
        for r in term_vectors_multi(
            spark, d, [r.docid for r in picks], cfg=cfg
        ).collect()
    }
    assert left == {r.docid for r in picks[1:]}


def test_term_vectors_deleted_doc_empty(spark, tiny_transcripts, tmp_path_factory):
    import shutil

    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.plans.deletes import delete_by_query

    d = str(tmp_path_factory.mktemp("tvdel") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, tiny_transcripts, d, TEST_CFG)
    victim = spark.read.parquet(f"{d}/forward").select("docid").collect()[0].docid
    assert term_vectors(spark, d, victim, cfg=TEST_CFG).count() > 0
    delete_by_query(spark, d, doc_filter=f"docid = {victim}", cfg=TEST_CFG)
    assert term_vectors(spark, d, victim, cfg=TEST_CFG).count() == 0
