"""Edge-ngram index WITH positions: phrase queries over the ngram field.

ES supports match_phrase on edge-ngram-analyzed fields when the unique
filter runs only_on_same_position; Lucene's EdgeNGramTokenFilter emits
every gram at its source token's position. So in this index (a) every
occurrence survives (the stream-wide unique dedup of the positionless
variant would silently break adjacency on repeated tokens), and (b) a
phrase query of *prefixes* matches docs whose consecutive source tokens
start with them — search-as-you-type over phrases."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.functions.analyze import (
    edge_ngrams_with_positions,
    tokenize_text,
)
from mysql_es_spark.operators.query import phrase_topk
from mysql_es_spark.plans.build import build_index

LO, HI = 2, 25
CFG = IndexConfig(
    n_buckets=2, wave_size=2, salt_docs=64, term_buckets=4, block_size=4,
    edge_ngram=True, edge_ngram_min=LO, edge_ngram_max=HI,
    with_positions=True,
)

DOCS = [
    ("c0", "spark streaming pipeline"),
    ("c1", "spartan streaming discipline"),
    ("c2", "streaming spark"),          # wrong order for "spa stream"
    ("c3", "spark fast streaming"),     # not consecutive
    ("c4", "w1 w2 w1 w2"),              # repeats: stream-wide unique would
    ("c5", "w2 w1"),                    #   lose the 2nd w1/w2 positions
    ("c6", "banana bread recipe"),
]


def _grams_of(tok: str) -> set[str]:
    return {tok[:n] for n in range(LO, min(len(tok), HI) + 1)} if len(tok) >= LO else {tok}


def _py_phrase_hits(text: str, phrase: str) -> int:
    """Start positions where each phrase term is a gram of the doc's
    consecutive source tokens — the Lucene positional contract above."""
    toks, ph = tokenize_text(text), tokenize_text(phrase)
    return sum(
        1
        for i in range(len(toks) - len(ph) + 1)
        if all(p in _grams_of(toks[i + j]) for j, p in enumerate(ph))
    )


@pytest.fixture(scope="module")
def ngram_pos_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ngph") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, CFG)
    return d


def _phrase(spark, ix, q):
    rows = phrase_topk(spark, ix, q, k=20, cfg=CFG, with_keys=True).collect()
    return {r.conv_id: r.n_hits for r in rows}


@pytest.mark.parametrize(
    "q",
    [
        "spark streaming",      # full tokens
        "spa stream",           # prefix phrase (search-as-you-type)
        "spa streaming",        # mixed prefix + full
        "w2 w1",                # needs the 2nd-occurrence positions in c4
        "w1 w2 w1",             # tri-gram phrase across repeats
        "banana bread recipe",
    ],
)
def test_ngram_phrase_matches_python_reference(spark, ngram_pos_index, q):
    got = _phrase(spark, ngram_pos_index, q)
    want = {cid: _py_phrase_hits(text, q) for cid, text in DOCS}
    want = {cid: n for cid, n in want.items() if n > 0}
    assert got == want


def test_ngram_pos_dl_counts_full_stream(spark, ngram_pos_index):
    """With only_on_same_position dedup every gram occurrence survives:
    dl is the full expanded stream length, not the unique-gram count."""
    want = {}
    for cid, text in DOCS:
        grams, _pos = edge_ngrams_with_positions(tokenize_text(text), LO, HI)
        want[cid] = len(grams)
    fwd = spark.read.parquet(f"{ngram_pos_index}/forward").select("docid", "conv_id")
    dls = (
        spark.read.parquet(f"{ngram_pos_index}/doc_lens")
        .join(fwd, "docid")
        .collect()
    )
    assert {r.conv_id: r.dl for r in dls} == want
    stats = spark.read.parquet(f"{ngram_pos_index}/corpus_stats").collect()[0]
    assert stats["sum_dl"] == sum(want.values())


def test_ngram_pos_tf_counts_occurrences(spark, ngram_pos_index):
    """tf of gram 'w1' in c4 is 2 (both occurrences), where the
    positionless unique-filter contract would have recorded 1."""
    fwd = {
        r.conv_id: r.docid
        for r in spark.read.parquet(f"{ngram_pos_index}/forward")
        .select("docid", "conv_id")
        .collect()
    }
    from mysql_es_spark.functions.codecs import decode_block

    blocks = (
        spark.read.parquet(f"{ngram_pos_index}/postings")
        .filter(F.col("term") == "w1")
        .select("n", "blob")
        .collect()
    )
    tf_of: dict[int, int] = {}
    for b in blocks:
        docids, tfs, _dls = decode_block(bytes(b.blob), b.n)
        for d, t in zip(docids.tolist(), tfs.tolist()):
            tf_of[d] = tf_of.get(d, 0) + t
    assert tf_of[fwd["c4"]] == 2
    assert tf_of[fwd["c5"]] == 1
