"""Unordered span_near (inOrder=false): doc set + hit counts vs a pure
Python oracle; ordered results are a subset; distinct-terms validation."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import phrase_topk
from mysql_es_spark.plans.build import build_index

CFG = IndexConfig(
    n_buckets=4, wave_size=2, salt_docs=64, term_buckets=4, block_size=4,
    with_positions=True,
)

DOCS = [
    ("c0", "scan table fast"),            # reversed order, adjacent-ish
    ("c1", "fast table scan"),            # in order
    ("c2", "fast x y table"),             # span 3 for pair (fast, table)
    ("c3", "table z fast z z table"),     # multiple windows
    ("c4", "fast alone"),
    ("c5", "table alone"),
    ("c6", "fast table fast table"),      # repeats
]


def _py_unordered_hits(text: str, terms: list[str], slop: int) -> int:
    toks = tokenize_text(text)
    occ = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
    if any(not v for v in occ.values()):
        return 0
    hits = 0
    span_max = len(terms) - 1 + slop
    for i, x in enumerate(toks):
        if x not in occ:
            continue
        lasts = []
        okk = True
        for t in terms:
            prior = [p for p in occ[t] if p <= i]
            if not prior:
                okk = False
                break
            lasts.append(prior[-1])
        if okk and i - min(lasts) <= span_max:
            hits += 1
    return hits


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spanix") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, CFG)
    rows = spark.read.parquet(f"{d}/forward").select("docid", "conv_id", "text").collect()
    return d, {r.docid: r.text for r in rows}


@pytest.mark.parametrize("slop", [0, 1, 2])
def test_unordered_matches_python_oracle(spark, ix, slop):
    d, fwd = ix
    got = {
        r.docid: r.n_hits
        for r in phrase_topk(
            spark, d, "fast table", k=100, cfg=CFG, slop=slop, ordered=False
        ).collect()
    }
    want = {
        doc: h
        for doc, t in fwd.items()
        if (h := _py_unordered_hits(t, ["fast", "table"], slop)) > 0
    }
    assert got == want, slop


def test_ordered_is_subset_of_unordered(spark, ix):
    d, fwd = ix
    o = {r.docid for r in phrase_topk(spark, d, "fast table", k=100, cfg=CFG).collect()}
    u = {
        r.docid
        for r in phrase_topk(
            spark, d, "fast table", k=100, cfg=CFG, slop=0, ordered=False
        ).collect()
    }
    assert o <= u
    # c0 ("scan table fast") unordered-matches within slop 1 but never ordered
    rev = {
        r.docid
        for r in phrase_topk(
            spark, d, "table fast scan", k=100, cfg=CFG, slop=2, ordered=False
        ).collect()
    }
    assert rev  # 3-term any-order window


def test_unordered_requires_distinct_terms(spark, ix):
    d, _ = ix
    with pytest.raises(ValueError):
        phrase_topk(spark, d, "fast fast", cfg=CFG, ordered=False)
