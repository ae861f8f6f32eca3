"""Index-backed prefix search: term-dict range scan + best-expansion BM25."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.operators.query import bm25_topk, prefix_topk
from mysql_es_spark.oracle import build_oracle_index, score_query

CFG = IndexConfig(n_buckets=2, wave_size=2, salt_docs=256, term_buckets=4)

DOCS = [
    ("c0", "spark spark spark engine"),
    ("c1", "sparkle dust"),
    ("c2", "spartan code"),
    ("c3", "spoon"),
    ("c4", "nothing relevant"),
]


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    from mysql_es_spark.plans.build import build_index

    d = str(tmp_path_factory.mktemp("prefix") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, CFG)
    return d


def test_prefix_hits_all_expansions(spark, ix):
    got = {
        r.conv_id
        for r in prefix_topk(spark, ix, "spa", k=10, cfg=CFG, with_keys=True).collect()
    }
    assert got == {"c0", "c1", "c2"}
    got_sp = {
        r.conv_id
        for r in prefix_topk(spark, ix, "sp", k=10, cfg=CFG, with_keys=True).collect()
    }
    assert got_sp == {"c0", "c1", "c2", "c3"}


def test_prefix_score_is_best_expansion(spark, ix):
    """Each doc's score equals its max single-term BM25 over expansions."""
    fwd = spark.read.parquet(f"{ix}/forward").select("docid", "text").collect()
    oracle = build_oracle_index([(r.docid, r.text) for r in fwd])
    got = {
        r.docid: r.score for r in prefix_topk(spark, ix, "spa", k=10, cfg=CFG).collect()
    }
    for docid, score in got.items():
        best = max(
            (s for t in ("spark", "sparkle", "spartan") for d, s in score_query(oracle, t, 10) if d == docid),
            default=None,
        )
        assert best is not None and math.isclose(score, best, abs_tol=1e-9)


def test_prefix_exact_term_equals_bm25(spark, ix):
    """A prefix that matches exactly one term scores like plain BM25."""
    a = [
        (r.docid, round(r.score, 9))
        for r in prefix_topk(spark, ix, "spartan", k=5, cfg=CFG).collect()
    ]
    b = [
        (r.docid, round(r.score, 9))
        for r in bm25_topk(spark, ix, "spartan", k=5, cfg=CFG, mode="simple").collect()
    ]
    assert a == b


def test_prefix_no_match_and_empty(spark, ix):
    assert prefix_topk(spark, ix, "zzz", k=5, cfg=CFG).count() == 0
    assert prefix_topk(spark, ix, "", k=5, cfg=CFG).count() == 0


def test_prefix_max_expansions_caps(spark, ix):
    """max_expansions=1 keeps only the highest-df expansion ('spark',
    df=1 ties broken by term asc → 'spark' wins over 'sparkle')."""
    got = {
        r.conv_id
        for r in prefix_topk(
            spark, ix, "spar", k=10, cfg=CFG, max_expansions=1, with_keys=True
        ).collect()
    }
    assert got == {"c0"}
