"""Percolate (reverse search) vs a Python oracle."""

from __future__ import annotations

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.percolate import percolate

QUERIES = [
    ("q_all", "w0 w3", "all"),
    ("q_any", "w7 w11", "any"),
    ("q_single", "w5", "all"),
    ("q_empty", "", "any"),
]


@pytest.fixture(scope="module")
def docs(spark, tiny_transcripts):
    return tiny_transcripts.selectExpr(
        "xxhash64(conv_id, turn_idx) AS doc_id", "text"
    ).cache()


def test_percolate_matches_oracle(spark, docs):
    rows = docs.collect()
    want = set()
    for r in rows:
        toks = set(tokenize_text(r.text))
        for qid, qtext, mode in QUERIES:
            qt = set(tokenize_text(qtext))
            if not qt:
                continue
            hit = qt <= toks if mode == "all" else bool(qt & toks)
            if hit:
                want.add((r.doc_id, qid))
    got = {(r.doc_id, r.query_id) for r in percolate(spark, docs, QUERIES).collect()}
    assert got == want
    # every query family genuinely fires, and not on everything
    by_q = {q: sum(1 for _, x in want if x == q) for q, _, _ in QUERIES}
    assert by_q["q_all"] and by_q["q_any"] and by_q["q_single"]
    assert by_q["q_all"] < len(rows)
    assert by_q["q_empty"] == 0


def test_percolate_validation(spark, docs):
    with pytest.raises(ValueError):
        percolate(spark, docs, [("q", "w0", "most")]).count()
    assert percolate(spark, docs, []).count() == 0
