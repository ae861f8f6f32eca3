"""curate(): quality → language → dedup → split composition."""

from __future__ import annotations

import hashlib

from mysql_es_spark.operators.curation import curate

LONG_EN = "the quick brown fox jumps over the lazy dog again today"


def _split_of(doc_id: int, pct: int = 80) -> str:
    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
    return "train" if b < pct else "test"


def test_curate_stages(spark):
    rows = [
        (0, "en", LONG_EN),
        (1, "en", "The  QUICK brown fox... jumps over the lazy dog, again; today"),
        (2, "es", LONG_EN + " y mas palabras aqui"),
        (3, "en", "short text"),
        (4, "en", "aa " * 11),
        (5, "en", "eleven distinct words make this document long enough to keep fine"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.doc_id: (r.lang, r.n_tokens, r.split)
        for r in curate(df, langs=("en",), train_pct=80).collect()
    }
    # d1 is a normalized duplicate of d0 (first id wins); d2 wrong lang;
    # d3 too short; d4 one-unigram spam
    assert set(got) == {0, 5}
    assert got[0] == ("en", 11, _split_of(0))
    assert got[5] == ("en", 11, _split_of(5))


def test_curate_dedup_cannot_straddle_split(spark):
    """Duplicates resolve to ONE surviving doc before the split tag, so a
    content clone can never appear in both train and test."""
    rows = [(i, "en", LONG_EN) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = curate(df, langs=("en",), train_pct=50).collect()
    assert len(got) == 1 and got[0].doc_id == 0


def test_curate_lang_allowlist(spark):
    rows = [
        (0, "en", LONG_EN),
        (1, "es", LONG_EN + " unico"),
        (2, "fr", LONG_EN + " unique"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id for r in curate(df, langs=("en", "fr")).collect()}
    assert got == {0, 2}
