"""Persisted MinHash store: incremental near-dup ingest against an
existing corpus without recomputing (or even reading) the old documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.operators.dedup import (
    build_minhash_store,
    extend_minhash_store,
    minhash_signatures,
    store_near_dups,
)

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
OTHER = "completely different text about spark shuffles and posting lists merging"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mhstore") / "store")
    corpus = _docs(
        spark,
        [
            (1, BASE),
            (2, OTHER),
            (3, "unrelated short text with its own words entirely here now"),
        ],
    )
    meta = build_minhash_store(spark, corpus, d, num_perm=128, bands=32, seed=7)
    assert meta["docs"] == 3
    return d


def test_new_batch_matches_stored_docs(spark, store):
    batch = _docs(
        spark,
        [
            (100, BASE.replace("dog", "cat")),  # near-dup of 1
            (101, "totally novel content nothing shares these tokens at all"),
        ],
    )
    got = store_near_dups(spark, batch, store, threshold=0.5).collect()
    assert {(r.doc_id, r.dup_of) for r in got} == {(100, 1)}
    assert all(0.5 <= r.est_jaccard <= 1.0 for r in got)


def test_estimator_matches_signature_overlap(spark, store):
    batch = _docs(spark, [(100, BASE.replace("dog", "cat"))])
    got = store_near_dups(spark, batch, store, threshold=0.0).collect()
    row = next(r for r in got if r.dup_of == 1)
    sig_new = minhash_signatures(batch, 3, 128, 7).collect()[0].sig
    old = _docs(spark, [(1, BASE)])
    sig_old = minhash_signatures(old, 3, 128, 7).collect()[0].sig
    want = sum(a == b for a, b in zip(sig_new, sig_old)) / 128
    assert abs(row.est_jaccard - want) < 1e-12


def test_in_batch_first_wins_pairs(spark, store):
    batch = _docs(
        spark,
        [
            (200, "a fresh paragraph with many novel tokens written here for this test"),
            (201, "a fresh paragraph with many novel tokens written here for that test"),
        ],
    )
    got = store_near_dups(
        spark, batch, store, threshold=0.4, include_new_pairs=True
    ).collect()
    # the later id duplicates the earlier one, never the reverse
    assert {(r.doc_id, r.dup_of) for r in got} == {(201, 200)}


def test_extend_then_match(spark, store):
    added = _docs(spark, [(300, "brand new stored document about incremental band tables")])
    out = extend_minhash_store(spark, added, store)
    assert out == {"docs_added": 1}
    probe = _docs(spark, [(400, "brand new stored document about incremental band joins")])
    got = store_near_dups(spark, probe, store, threshold=0.4).collect()
    assert {(r.doc_id, r.dup_of) for r in got} == {(400, 300)}


def test_identical_doc_estimates_one(spark, store):
    batch = _docs(spark, [(500, OTHER)])
    got = store_near_dups(spark, batch, store, threshold=0.9).collect()
    assert [(r.doc_id, r.dup_of, r.est_jaccard) for r in got] == [(500, 2, 1.0)]
