"""Fan-out guards in pair-generation dedup (VERDICT r2 "What's wrong" #2).

The pathological web-scale shape is m byte-identical (or band-identical)
documents: an unguarded shingle/band self-join pushes O(m²) candidate
rows through the shuffle. The guards are:

- exact-text collapse (``collapse_exact``): the quadratic stages see each
  distinct text once; the pair set is expanded back afterwards, so the
  OUTPUT is identical (within-group Jaccard is exactly 1.0);
- ``max_shingle_df``: stop-shingles shared by more than N distinct texts
  are dropped before pairing;
- ``max_band_bucket``: oversized LSH band buckets degrade to a
  mega-cluster (``minhash_megaclusters``) instead of being paired out.

Reference analog: mysql-es dedups by primary key on upsert
(Record.getID); these operators generalize that to content identity.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mysql_es_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow today",
]


@pytest.fixture(scope="module")
def dup_corpus(spark):
    # 4 distinct texts; text 0 appears 5x, text 2 appears 3x
    rows = []
    i = 0
    for t_idx, copies in ((0, 5), (1, 1), (2, 3), (3, 1)):
        for _ in range(copies):
            rows.append((i, TEXTS[t_idx]))
            i += 1
    return _docs(spark, rows)


def _pairset(df):
    return {(r.id_a, r.id_b, r.jaccard) for r in df.collect()}


def test_jaccard_collapse_output_identical(dup_corpus):
    base = _pairset(
        dedup.ngram_jaccard_pairs(
            dup_corpus, n=2, threshold=0.2, collapse_exact=False, max_shingle_df=None
        )
    )
    guarded = _pairset(
        dedup.ngram_jaccard_pairs(
            dup_corpus, n=2, threshold=0.2, collapse_exact=True, max_shingle_df=None
        )
    )
    assert base == guarded
    # sanity: within-group pairs are present at exactly 1.0
    assert (0, 1, 1.0) in guarded and (6, 8, 1.0) in guarded


def test_minhash_collapse_output_identical(dup_corpus):
    kw = dict(n=2, num_perm=16, bands=8, threshold=0.2)
    base = _pairset(dedup.minhash_lsh_pairs(dup_corpus, collapse_exact=False, **kw))
    guarded = _pairset(dedup.minhash_lsh_pairs(dup_corpus, collapse_exact=True, **kw))
    assert base == guarded


def test_short_doc_groups_emit_no_pairs(spark):
    # identical one-token texts have an EMPTY 2-shingle set: the
    # uncollapsed join emits no pair for them, so neither may expansion.
    df = _docs(spark, [(1, "hello"), (2, "hello"), (3, TEXTS[0]), (4, TEXTS[0])])
    out = _pairset(dedup.ngram_jaccard_pairs(df, n=2, threshold=0.2))
    assert out == {(3, 4, 1.0)}
    out_mh = _pairset(dedup.minhash_lsh_pairs(df, n=2, num_perm=16, bands=8, threshold=0.2))
    assert out_mh == {(3, 4, 1.0)}


def test_max_shingle_df_caps_stop_shingles(spark):
    # 6 docs share the stop-shingle "aa bb"; with the cap below 6 the
    # only co-occurrence evidence left is each pair's private overlap.
    rows = [(i, f"aa bb unique{i} word{i}") for i in range(6)]
    rows += [(10, "aa bb shared tail"), (11, "aa bb shared tail")]
    df = _docs(spark, rows)
    capped = dedup.ngram_jaccard_pairs(df, n=2, threshold=0.01, max_shingle_df=3)
    got = _pairset(capped)
    # unique{i} docs pair ONLY via "aa bb" which is capped away -> gone;
    # 10/11 remain (identical text -> collapse group, jaccard 1.0)
    assert got == {(10, 11, 1.0)}


def test_mass_identical_docs_linear_candidates(spark):
    """10k byte-identical docs: signatures/banding/verify run on ONE
    representative; output is still all C(m,2) pairs at jaccard 1.0."""
    m = 10_000
    pdf = pd.DataFrame({"doc_id": range(m), "text": [TEXTS[0]] * m})
    df = spark.createDataFrame(pdf)
    reps, members = dedup._collapse_by_text(df, "doc_id", "text")
    assert reps.count() == 1
    assert members.count() == m
    pairs = dedup.minhash_lsh_pairs(df, n=2, num_perm=16, bands=8, threshold=0.5)
    assert pairs.count() == m * (m - 1) // 2


def test_band_bucket_guard_and_megaclusters(spark):
    # 8 near-identical but DISTINCT docs (one suffix token differs) land
    # in the same band buckets for most bands; cap buckets at 3 -> no
    # pairs from those buckets; megaclusters reports them instead.
    base = " ".join([TEXTS[0]] * 4)
    rows = [(i, base + f" tail{i}") for i in range(8)]
    rows += [(100, TEXTS[2]), (101, TEXTS[3])]
    df = _docs(spark, rows)
    unguarded = dedup.minhash_lsh_pairs(
        df, n=2, num_perm=16, bands=8, threshold=0.2, max_band_bucket=None
    )
    assert unguarded.count() > 0
    guarded = dedup.minhash_lsh_pairs(
        df, n=2, num_perm=16, bands=8, threshold=0.2, max_band_bucket=1
    )
    # bucket guard at 1 kills every multi-doc bucket -> only exact-dup
    # (collapse-group) pairs can survive; here all texts are distinct
    assert guarded.count() == 0
    mega = dedup.minhash_megaclusters(
        df, n=2, num_perm=16, bands=8, max_band_bucket=3
    ).collect()
    assert len(mega) > 0
    biggest = max(mega, key=lambda r: r.n_docs)
    assert biggest.n_docs >= 4
    assert set(biggest.members) <= set(range(8))


def test_megaclusters_expand_exact_members(spark):
    # 5 byte-identical docs collapse to one rep; the rep alone can't
    # exceed the bucket cap, but with two near-identical *distinct* texts
    # the bucket has 2 reps; members must expand back to all copies.
    rows = [(i, TEXTS[0] + " x") for i in range(5)] + [(50, TEXTS[0] + " y")]
    df = _docs(spark, rows)
    mega = dedup.minhash_megaclusters(
        df, n=2, num_perm=16, bands=8, max_band_bucket=1
    ).collect()
    assert any(set(r.members) == {0, 1, 2, 3, 4, 50} for r in mega)
