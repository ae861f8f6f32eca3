"""Dedup operators vs small Python oracles."""

from __future__ import annotations

import itertools

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "The QUICK brown fox jumps over the lazy dog"),  # exact dup of 0 (normalized)
    (2, "the quick brown fox jumps over the lazy cat"),  # near dup of 0
    (3, "spark builds inverted indexes with posting lists"),
    (4, "spark builds inverted indexes with postings lists"),  # near dup of 3
    (5, "completely unrelated text about databases and storage"),
    (6, ""),
    (7, None),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, schema="doc_id long, text string")


def _py_shingles(text, n):
    toks = tokenize_text(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_jaccard(a, b, n):
    sa, sb = _py_shingles(a, n), _py_shingles(b, n)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(spark, docs_df):
    kept = {r.doc_id for r in dedup.exact_dedup(docs_df).collect()}
    # doc 1 is a case-variant of doc 0 → dropped; empty and null normalize
    # to the same empty fingerprint → one survivor (6)
    assert 0 in kept and 1 not in kept
    assert (6 in kept) != (7 in kept)
    assert {2, 3, 4, 5} <= kept


def test_duplicate_groups(spark, docs_df):
    groups = dedup.duplicate_groups(docs_df).collect()
    by_keep = {r.keep_id: r.n_dups for r in groups}
    assert by_keep.get(0) == 2  # docs 0,1
    assert by_keep.get(6) == 2  # docs 6,7 (empty-normalized)


def test_ngram_jaccard_matches_python(spark, docs_df):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs_df, n=3, threshold=0.3).collect()
    }
    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        j = _py_jaccard(ta or "", tb or "", 3)
        if j >= 0.3:
            want[(ia, ib)] = round(j, 4)
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (0, 2) in got  # near dup


def test_minhash_lsh_finds_near_dups(spark, docs_df):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(
            docs_df, n=3, num_perm=64, bands=32, threshold=0.3
        ).collect()
    }
    # exact dup must always be caught (identical signatures); jaccard exact
    assert pairs.get((0, 1)) == 1.0
    for (a, b), j in pairs.items():
        assert j == round(_py_jaccard(DOCS[a][1] or "", DOCS[b][1] or "", 3), 4)


def test_minhash_signature_paths_identical(spark, docs_df):
    """The zero-shuffle set path and the exploded row path must produce
    bit-identical signatures for BOTH base hashes — an incremental store
    built under one code path is compared against batches signed under a
    later one, so any kernel drift silently breaks ingest dedup."""
    for bh in ("xxhash64", "md5"):
        by_set = {
            r.doc_id: r.sig
            for r in dedup.minhash_signatures(docs_df, n=3, base_hash=bh).collect()
        }
        by_row = {
            r.doc_id: r.sig
            for r in dedup.minhash_signatures(
                docs_df, n=3, base_hash=bh, shingles_df=dedup.shingles(docs_df, 3)
            ).collect()
        }
        assert by_set == by_row and len(by_set) == 6  # docs 6/7 have no shingles


def test_minhash_set_form_hash_state_guard(spark, docs_df):
    """A set-form shingles_df whose element type disagrees with base_hash
    must be rejected loudly — md5 over stringified int64 hashes would
    silently produce signatures matching neither pipeline and poison an
    incremental store."""
    hashed = dedup.shingle_sets(docs_df, 3, hashed=True)  # array<bigint>
    raw = dedup.shingle_sets(docs_df, 3, hashed=False)  # array<string>
    with pytest.raises(ValueError, match="md5"):
        dedup.minhash_signatures(docs_df, shingles_df=hashed, base_hash="md5")
    with pytest.raises(ValueError, match="xxhash64"):
        dedup.minhash_signatures(docs_df, shingles_df=raw, base_hash="xxhash64")
    # the matching combinations still work and agree with the default path
    ok = {r.doc_id: r.sig for r in dedup.minhash_signatures(
        docs_df, shingles_df=hashed, base_hash="xxhash64").collect()}
    default = {r.doc_id: r.sig for r in dedup.minhash_signatures(docs_df).collect()}
    assert ok == default


def test_minhash_signatures_string_id(spark):
    """_sig_from_sets derives the id type from the input schema — a
    string id column must survive the kernel unchanged."""
    df = spark.createDataFrame(
        [("a", "the quick brown fox jumps over the dog"),
         ("b", "the quick brown fox jumps over the cat")],
        schema="doc_id string, text string",
    )
    sigs = dedup.minhash_signatures(df).collect()
    assert {r.doc_id for r in sigs} == {"a", "b"}
    assert all(len(r.sig) == 64 for r in sigs)


def test_exact_jaccard_accepts_set_form(spark, docs_df):
    """exact_jaccard_for_pairs explodes a set-form (id, shs) frame
    internally; result must equal the row-form computation."""
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (3, 4), (0, 5)], schema="id_a long, id_b long"
    )
    via_sets = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.exact_jaccard_for_pairs(
            docs_df, pairs, shingles_df=dedup.shingle_sets(docs_df, 3)
        ).collect()
    }
    via_rows = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.exact_jaccard_for_pairs(docs_df, pairs).collect()
    }
    assert via_sets == via_rows
    assert via_sets[(0, 1)] == 1.0 and via_sets[(0, 5)] == 0.0


def test_simhash_properties(spark, docs_df):
    sh = {r.doc_id: r.simhash for r in dedup.simhash(docs_df).collect()}
    assert len(sh) == len(DOCS)
    assert sh[0] == sh[1]  # normalization-identical docs
    assert sh[6] == 0 and sh[7] == 0  # zero-token docs
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert ham(sh[0], sh[2]) < ham(sh[0], sh[5])  # near closer than far


def test_simhash_near_dups(spark, docs_df):
    pairs = {(r.id_a, r.id_b) for r in dedup.simhash_near_dups(docs_df, max_hamming=12).collect()}
    assert (0, 1) in pairs


def test_embedding_near_dups(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),  # ~dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.98, 0.2]),  # ~dup of 2
        (4, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, schema="vec_id long, embedding array<double>")
    pairs = {(r.id_a, r.id_b): r.cos for r in dedup.embedding_near_dups(df, 0.95).collect()}
    assert set(pairs) == {(0, 1), (2, 3)}
    assert pairs[(0, 1)] > 0.99


def test_embedding_near_dups_distributed_matches_broadcast(spark):
    """The default (triangle-block-join) path is exact: identical output to
    the broadcast-matmul path on a real embedding table, across block
    counts (including n_blocks=1 and n_blocks > distinct blocks)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    want = sorted(
        ((r.id_a, r.id_b, r.cos) for r in
         dedup.embedding_near_dups(emb, 0.3, broadcast=True).collect())
    )
    assert want  # the fixture must actually contain near-dup pairs
    for nb in (1, 3, 8):
        got = sorted(
            ((r.id_a, r.id_b, r.cos) for r in
             dedup.embedding_near_dups(emb, 0.3, n_blocks=nb).collect())
        )
        assert got == want, f"n_blocks={nb}"


def test_embedding_near_dups_no_driver_collect(spark, monkeypatch):
    """Constructing the default plan must never pull the vector table to
    the driver (the 100 TB contract): DataFrame.collect is poisoned while
    the plan is built."""
    from pyspark.sql import DataFrame

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def boom(self):
        raise AssertionError("driver-side collect during plan construction")

    monkeypatch.setattr(DataFrame, "collect", boom)
    plan = dedup.embedding_near_dups(emb, 0.3)  # must not collect
    monkeypatch.undo()
    assert plan.count() > 0


def test_winnow_guarantee_and_overlap(spark):
    """Winnowing guarantee: any shared token run of length >= k+window-1
    yields >= 1 identical fingerprint; disjoint-vocab docs share none."""
    from mysql_es_spark.operators import dedup

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8-token run
    docs = [
        (0, f"intro words here {shared} closing remarks"),
        (1, f"{shared} completely different tail part"),
        (2, "nothing in common with others at all whatsoever"),
        (3, f"intro words here {shared} closing remarks"),  # exact dup of 0
    ]
    df = spark.createDataFrame(docs, schema="doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in dedup.winnow_overlap_pairs(df, k=4, window=4, min_shared=1).collect()
    }
    assert (0, 1) in pairs  # partial overlap found
    assert (0, 3) in pairs  # exact dup found
    assert not any(2 in p for p in pairs)  # disjoint doc pairs with nobody
    # exact duplicates share every fingerprint
    fps = dedup.winnow_fingerprints(df, k=4, window=4)
    f0 = {r.fp for r in fps.filter("doc_id = 0").collect()}
    f3 = {r.fp for r in fps.filter("doc_id = 3").collect()}
    assert f0 == f3 and len(f0) > 0
    # the guarantee is hash-agnostic: the SQL-reproducible md5 mode finds
    # the same overlap structure (fingerprint values differ, pairs don't)
    md5_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.winnow_overlap_pairs(
            df, k=4, window=4, min_shared=1, base_hash="md5"
        ).collect()
    }
    assert {(0, 1), (0, 3)} <= md5_pairs and not any(2 in p for p in md5_pairs)


def test_simhash_md5_mode_matches_reference_hash(spark):
    """base_hash='md5' must equal int.from_bytes(md5(term)[:8], 'little')
    semantics (== DuckDB md5_number_upper) — checked via a hand-computed
    single-term doc whose simhash is exactly its term hash's sign bits."""
    import hashlib

    import numpy as np

    from mysql_es_spark.operators import dedup

    df = spark.createDataFrame([(0, "hello"), (1, "hello")], "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in dedup.simhash(df, base_hash="md5").collect()}
    h = int.from_bytes(hashlib.md5(b"hello").digest()[:8], "little")
    # single positive-tf term: every set bit votes +1, every clear bit -1
    want = np.uint64(h).astype(np.int64)
    assert got[0] == got[1] == want
    pairs = dedup.simhash_near_dups(df, max_hamming=0, base_hash="md5").collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(0, 1, 0)]


def test_winnow_short_docs(spark):
    from mysql_es_spark.operators import dedup

    df = spark.createDataFrame(
        [(0, "one two three"), (1, ""), (2, None)], schema="doc_id long, text string"
    )
    # < k tokens -> no fingerprints, no crash
    assert dedup.winnow_fingerprints(df, k=4, window=4).count() == 0


def test_contamination_pairs(spark):
    corpus_df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a totally unrelated document about spark shuffles"),
            (3, "quick brown fox but then it diverges completely"),
        ],
        schema="doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, "What does the quick brown fox jump over?")],
        schema="probe_id long, text string",
    )
    got = {
        (r.doc_id, r.probe_id): r.n_shared
        for r in dedup.contamination_pairs(corpus_df, probes, n=3).collect()
    }
    # doc 1 shares "the quick brown", "quick brown fox" with the probe;
    # doc 3 shares only "quick brown fox"; doc 2 shares nothing
    assert got == {(1, 100): 2, (3, 100): 1}

    # broadcast off must give identical results (same join, shuffled)
    got2 = {
        (r.doc_id, r.probe_id): r.n_shared
        for r in dedup.contamination_pairs(
            corpus_df, probes, n=3, broadcast_probes=False
        ).collect()
    }
    assert got2 == got


def test_semantic_dedup_exact_anchor(spark):
    """n_cells=1 == exact corpus-wide semantic dedup vs a numpy oracle."""
    import numpy as np

    from mysql_es_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    S = Mn @ Mn.T
    thr = 0.3
    # components via union-find
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    iu, ju = np.triu_indices(len(ids), k=1)
    for a, b in zip(ids[iu[S[iu, ju] >= thr]], ids[ju[S[iu, ju] >= thr]]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {int(i): find(int(i)) for i in ids}
    assert len({v for v in want.values()}) < len(ids), "need some dups at thr"

    got = semantic_dedup(emb, threshold=thr, n_cells=1).collect()
    assert {r.vec_id: r.cluster for r in got} == want
    assert all(r.keep == (r.vec_id == r.cluster) for r in got)


def test_semantic_dedup_cells_refine(spark):
    """More cells only SPLIT components (within-cell pairs are a subset of
    all pairs): every n_cells=4 cluster sits inside one n_cells=1
    cluster, and each cluster keeps exactly its minimum id."""
    from collections import defaultdict

    from mysql_es_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full = {r.vec_id: r.cluster for r in semantic_dedup(emb, 0.3, n_cells=1).collect()}
    cells = semantic_dedup(emb, 0.3, n_cells=4, seed=5).collect()
    groups = defaultdict(set)
    for r in cells:
        groups[r.cluster].add(r.vec_id)
        assert r.keep == (r.vec_id == r.cluster)
    for cl, members in groups.items():
        assert cl == min(members)
        assert len({full[m] for m in members}) == 1, "cell split crossed a component"


def test_dedup_keep_best(spark):
    from mysql_es_spark.operators.dedup import dedup_keep_best

    # components: {1,2,3} (path graph), {4,5}, {6} singleton
    ids = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (5, 0.1), (6, 0.0)],
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "id_a long, id_b long")
    out = {r.doc_id: (r.cluster_id, r.kept) for r in dedup_keep_best(ids, pairs, "q").collect()}
    # winner of {1,2,3}: q=0.9 tie between 2 and 3 -> smallest id 2
    assert out[1] == (1, False) and out[2] == (1, True) and out[3] == (1, False)
    assert out[4] == (4, True) and out[5] == (4, False)
    assert out[6] == (6, True)
    assert len(out) == 6


def test_sequence_dedup(spark):
    from mysql_es_spark.operators.dedup import dedup_sequences, sequence_fingerprint

    rows = [
        # conv 1 and conv 3: identical turn texts in order (diff ids/case)
        (1, 0, "Hello  there"), (1, 1, "general kenobi"),
        (3, 0, "hello there"), (3, 1, "General Kenobi"),
        # conv 2: same characters, different turn boundaries — NOT a dup
        (2, 0, "hello thereg"), (2, 1, "eneral kenobi"),
        # conv 4: different content
        (4, 0, "something else"),
    ]
    df = spark.createDataFrame(rows, "conv long, turn int, text string")
    fps = {r.conv: (r.fp, r.n_items) for r in
           sequence_fingerprint(df, "conv", ["turn"], "text").collect()}
    assert fps[1] == fps[3]
    assert fps[1][0] != fps[2][0]  # boundary shift changes the fingerprint
    assert fps[1][1] == 2 and fps[4][1] == 1

    kept = sorted(r.conv for r in dedup_sequences(df, "conv", ["turn"], "text").collect())
    assert kept == [1, 2, 4]  # lowest key per identical sequence

    # normalize=False: case/whitespace differences separate 1 and 3
    raw = {r.conv: r.fp for r in
           sequence_fingerprint(df, "conv", ["turn"], "text", normalize=False).collect()}
    assert raw[1] != raw[3]


def test_sequences_as_documents_bridge(spark):
    from mysql_es_spark.operators.dedup import (
        minhash_lsh_pairs,
        sequences_as_documents,
    )

    # conv 10 and 11 share most turns (near-dups at the conversation
    # unit); conv 12 is unrelated
    turns = []
    for c, texts in [
        (10, ["alpha beta gamma delta", "epsilon zeta eta theta", "iota kappa"]),
        (11, ["alpha beta gamma delta", "epsilon zeta eta theta", "iota kappa CHANGED"]),
        (12, ["totally different content here", "nothing shared at all"]),
    ]:
        for t, txt in enumerate(texts):
            turns.append((c, t, txt))
    df = spark.createDataFrame(turns, "conv long, turn int, text string")
    docs = sequences_as_documents(df, "conv", ["turn"], "text")
    got = {r.doc_id: r.text for r in docs.collect()}
    assert got[10].splitlines() == [
        "alpha beta gamma delta", "epsilon zeta eta theta", "iota kappa"
    ]
    # doc-level near-dup machinery now runs at the conversation unit
    pairs = minhash_lsh_pairs(docs, n=3, num_perm=64, bands=16, threshold=0.3).collect()
    got_pairs = {(r.id_a, r.id_b) for r in pairs}
    assert (10, 11) in got_pairs
    assert all({a, b} != {10, 12} and {a, b} != {11, 12} for a, b in got_pairs)
