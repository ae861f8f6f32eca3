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


def test_percolate_non_unique_id(spark, tiny_transcripts):
    """'all' mode must count DISTINCT terms per id: with conv-level ids a
    conversation matching 'w0' in two turns but never 'w999...' must NOT
    satisfy an all-of-two query."""
    docs = tiny_transcripts.select("conv_id", "text")
    q = [("both", "w0 w3", "all")]
    got = {r[0] for r in percolate(spark, docs, q, id_col="conv_id").collect()}
    rows = docs.collect()
    conv_terms: dict[str, set] = {}
    for r in rows:
        conv_terms.setdefault(r.conv_id, set()).update(tokenize_text(r.text))
    want = {c for c, ts in conv_terms.items() if {"w0", "w3"} <= ts}
    assert got == want
    # weak-test guard: some conv has w0 twice but no w3 (the false-positive
    # shape the old per-row counting produced)
    from collections import Counter

    per_conv = {}
    for r in rows:
        per_conv.setdefault(r.conv_id, Counter()).update(set(tokenize_text(r.text)))
    assert any(
        c["w0"] >= 2 and "w3" not in c for c in per_conv.values()
    ), "corpus lacks the regression shape"


def test_percolate_duplicate_id_rejected(spark, docs):
    with pytest.raises(ValueError):
        percolate(spark, docs, [("q", "w0", "all"), ("q", "w1", "any")]).count()


def test_percolate_phrase_mode(spark, docs):
    rows = docs.collect()
    queries = [
        ("p1", "w0 w3", "phrase"),
        ("p2", "w1 w1", "phrase"),  # repeated term: adjacency, not just presence
        ("p_all", "w0 w3", "all"),
        ("p_empty", " .. ", "phrase"),
    ]
    got = {
        (r.doc_id, r.query_id)
        for r in percolate(spark, docs, queries).collect()
    }
    want = set()
    for r in rows:
        toks = tokenize_text(r.text)
        pairs = list(zip(toks, toks[1:]))
        if ("w0", "w3") in pairs:
            want.add((r.doc_id, "p1"))
        if ("w1", "w1") in pairs:
            want.add((r.doc_id, "p2"))
        if {"w0", "w3"} <= set(toks):
            want.add((r.doc_id, "p_all"))
    assert got == want
    # the phrase constraint is strictly tighter than containment
    p1 = {d for d, q in got if q == "p1"}
    pall = {d for d, q in got if q == "p_all"}
    assert p1 < pall


def test_percolate_phrase_never_spans_rows(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (1, "gamma delta"), (2, "beta gamma")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.query_id)
        for r in percolate(spark, df, [("p", "beta gamma", "phrase")]).collect()
    }
    # id 1 has beta (row 1) and gamma (row 2) but never adjacent in one row
    assert got == {(2, "p")}


def test_percolate_filters(spark):
    from mysql_es_spark.operators.percolate import percolate_filters

    docs = spark.createDataFrame(
        [(1, "en", 120), (2, "fr", 80), (3, "en", 30), (4, None, 500)],
        "doc_id long, lang string, n_chars long",
    )
    queries = [
        ("long_en", "lang = 'en' AND n_chars >= 100"),
        ("short", "n_chars < 50"),
        ("always", "1 = 1"),
        ("never", "n_chars < 0"),
    ]
    got = {(r.doc_id, r.query_id) for r in percolate_filters(spark, docs, queries).collect()}
    want = {
        (1, "long_en"), (3, "short"),
        (1, "always"), (2, "always"), (3, "always"), (4, "always"),
    }
    assert got == want
    # one projection: no joins, no shuffles in the plan
    from tests.test_plan_audits import plan_of

    plan = plan_of(percolate_filters(spark, docs, queries))
    assert ") Exchange" not in plan and "Join" not in plan

    with pytest.raises(ValueError, match="pure"):
        percolate_filters(spark, docs, [("bad", "rand() > 0.5")])
    with pytest.raises(ValueError, match="duplicate"):
        percolate_filters(spark, docs, [("a", "1=1"), ("a", "1=1")])
    assert percolate_filters(spark, docs, []).count() == 0
