"""Benchmark decontamination: training docs sharing any word n-gram with
a held-out eval set are flagged; counts are exact distinct-shingle
overlap. Verified on a hand-built corpus with known overlaps."""

from __future__ import annotations

from mysql_es_spark.operators.dedup import decontaminate

TRAIN = [
    (0, "the quick brown fox jumps over the lazy dog"),   # contains eval A
    (1, "colorless green ideas sleep furiously tonight"),  # clean
    (2, "pack my box with five dozen liquor jugs today"),  # contains eval B
    (3, "tiny"),                                           # < n tokens
    (4, "the quick brown fox naps quietly all afternoon"), # shares 4-gram w/ A? no (n=5)
]
EVAL = [
    (100, "see the quick brown fox jumps over a fence"),
    (101, "please pack my box with five dozen liquor jugs"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_decontaminate_flags_exact_overlaps(spark):
    out = {
        r.doc_id: (r.n_shingles, r.n_hits, r.contaminated)
        for r in decontaminate(_df(spark, TRAIN), _df(spark, EVAL), n=5).collect()
    }
    # doc 0: 5 distinct 5-grams; "the quick brown fox jumps" and
    # "quick brown fox jumps over" occur in eval doc 100
    assert out[0] == (5, 2, True)
    assert out[1] == (2, 0, False)
    # doc 2: "pack my box with five" ... "five dozen liquor jugs today";
    # eval 101 holds the first four of those windows
    assert out[2] == (5, 4, True)
    assert out[3] == (0, 0, False)  # shorter than n → clean by definition
    assert out[4] == (4, 0, False)  # 4-token overlap only, below n=5
    assert set(out) == {0, 1, 2, 3, 4}


def test_decontaminate_n_sensitivity(spark):
    """At n=4 the shared 'the quick brown fox' window flags doc 4 too."""
    out = {
        r.doc_id: r.contaminated
        for r in decontaminate(_df(spark, TRAIN), _df(spark, EVAL), n=4).collect()
    }
    assert out[4] is True and out[1] is False


def test_decontaminate_shuffle_join_path_matches(spark):
    a = decontaminate(_df(spark, TRAIN), _df(spark, EVAL), n=5, broadcast_eval=True)
    b = decontaminate(_df(spark, TRAIN), _df(spark, EVAL), n=5, broadcast_eval=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
