"""ES intervals filter rules (overlapping / containing / contained_by /
before / after and their negations) over the positional index — verified
against a pure-Python span-algebra reference on a hand-built corpus, plus
degenerate cases (absent filter term, absent source term, overlap with
multi-token spans crossing each other)."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import (
    _INTERVAL_FILTER_RULES,
    intervals_filter_topk,
)
from mysql_es_spark.plans.build import build_index

CFG = IndexConfig(
    n_buckets=2, wave_size=2, salt_docs=4, term_buckets=4, block_size=4,
    with_positions=True,
)

DOCS = [
    ("c0", "alpha beta gamma delta"),          # "beta gamma" inside, alpha before
    ("c1", "beta gamma alpha"),                # alpha after the phrase
    ("c2", "beta alpha gamma"),                # alpha splits the pair: no phrase
    ("c3", "alpha beta gamma alpha beta"),     # phrase + alphas on both sides
    ("c4", "beta gamma beta gamma"),           # two phrase spans, no alpha
    ("c5", "delta epsilon zeta"),              # nothing relevant
    ("c6", "beta gamma"),                      # phrase only
    ("c7", "alpha alpha beta gamma alpha"),
]


@pytest.fixture(scope="module")
def iv_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivfilter") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, CFG)
    fwd = spark.read.parquet(f"{d}/forward").select("docid", "conv_id").collect()
    return d, {r.docid: r.conv_id for r in fwd}


def _spans(toks: list[str], phrase: list[str]) -> list[tuple[int, int]]:
    m = len(phrase)
    return [
        (i, i + m - 1)
        for i in range(len(toks) - m + 1)
        if toks[i : i + m] == phrase
    ]


def _py_rule(source: str, rule: str, filt: str) -> dict[str, tuple[int, float]]:
    """{conv_id: (n_hits, score)} per the ES/Lucene interval filter rules."""
    src, flt = tokenize_text(source), tokenize_text(filt)
    toks = {cid: tokenize_text(t) for cid, t in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for cid, tl in toks.items():
        s_spans = _spans(tl, src)
        f_spans = _spans(tl, flt)
        base = rule[4:] if rule.startswith("not_") else rule
        keep = []
        for (ss, se) in s_spans:
            if base == "overlapping":
                hit = any(fs <= se and fe >= ss for fs, fe in f_spans)
            elif base == "containing":
                hit = any(ss <= fs and fe <= se for fs, fe in f_spans)
            elif base == "contained_by":
                hit = any(fs <= ss and se <= fe for fs, fe in f_spans)
            elif base == "before":
                hit = any(se < fs for fs, fe in f_spans)
            else:  # after
                hit = any(fe < ss for fs, fe in f_spans)
            keep.append(not hit if rule.startswith("not_") else hit)
        n_hits = sum(keep)
        if n_hits:
            score = 0.0
            for t in dict.fromkeys(src):
                df_t = sum(1 for tl2 in toks.values() if t in tl2)
                idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
                tf = tl.count(t)
                score += idf * tf / (tf + CFG.k1 * (1 - CFG.b + CFG.b * len(tl) / avgdl))
            out[cid] = (n_hits, score)
    return out


def _got(spark, ix, docmap, source, rule, filt):
    rows = intervals_filter_topk(spark, ix, source, rule, filt, k=20, cfg=CFG).collect()
    return {docmap[r.docid]: (r.n_hits, r.score) for r in rows}


@pytest.mark.parametrize("rule", _INTERVAL_FILTER_RULES)
def test_rules_match_python_reference(spark, iv_index, rule):
    ix, docmap = iv_index
    got = _got(spark, ix, docmap, "beta gamma", rule, "alpha")
    exp = _py_rule("beta gamma", rule, "alpha")
    assert {c: h for c, (h, _) in got.items()} == {c: h for c, (h, _) in exp.items()}
    for c in exp:
        assert got[c][1] == pytest.approx(exp[c][1], abs=1e-9)


@pytest.mark.parametrize("rule", ["overlapping", "not_overlapping", "contained_by"])
def test_phrase_filter_side(spark, iv_index, rule):
    """Multi-token filter spans ('beta gamma') against a single-term source."""
    ix, docmap = iv_index
    got = _got(spark, ix, docmap, "alpha", rule, "beta gamma")
    exp = _py_rule("alpha", rule, "beta gamma")
    assert {c: h for c, (h, _) in got.items()} == {c: h for c, (h, _) in exp.items()}


def test_absent_filter_term(spark, iv_index):
    """Positive rules: no filter span anywhere -> empty. Negations: degrade
    to the plain source match (every source span survives)."""
    ix, docmap = iv_index
    assert _got(spark, ix, docmap, "beta gamma", "overlapping", "qqq") == {}
    got = _got(spark, ix, docmap, "beta gamma", "not_overlapping", "qqq")
    exp = _py_rule("beta gamma", "not_overlapping", "qqq")
    assert {c: h for c, (h, _) in got.items()} == {c: h for c, (h, _) in exp.items()}


def test_absent_source_term(spark, iv_index):
    ix, docmap = iv_index
    assert _got(spark, ix, docmap, "qqq", "overlapping", "alpha") == {}


def test_bad_rule_raises(spark, iv_index):
    ix, _ = iv_index
    with pytest.raises(ValueError, match="unsupported"):
        intervals_filter_topk(spark, ix, "beta", "sideways", "alpha", cfg=CFG)


def test_dsl_filter_path(spark, iv_index):
    """intervals_topk accepts ES's nested filter syntax and matches the
    direct intervals_filter_topk call."""
    from mysql_es_spark.operators.query import intervals_topk

    ix, docmap = iv_index
    rule = {"match": {"query": "beta gamma",
                      "filter": {"before": {"match": {"query": "alpha"}}}}}
    via_dsl = {
        docmap[r.docid]: r.score
        for r in intervals_topk(spark, ix, rule, k=20, cfg=CFG).collect()
    }
    direct = {
        docmap[r.docid]: r.score
        for r in intervals_filter_topk(
            spark, ix, "beta gamma", "before", "alpha", k=20, cfg=CFG
        ).collect()
    }
    assert via_dsl == direct and via_dsl
    with pytest.raises(ValueError, match="consecutive"):
        intervals_topk(spark, ix, {"match": {"query": "beta gamma", "max_gaps": 2,
                                             "filter": {"before": {"match": {"query": "alpha"}}}}},
                       cfg=CFG)


def test_span_containing_and_within(spark, iv_index):
    """span_containing(big, little) == rule 'containing'; span_within is
    the mirror scored on the little side."""
    from mysql_es_spark.operators.query import (
        span_containing_topk,
        span_within_topk,
    )

    ix, docmap = iv_index
    cont = {
        docmap[r.docid]: (r.n_hits, r.score)
        for r in span_containing_topk(spark, ix, "beta gamma", "gamma", k=20, cfg=CFG).collect()
    }
    exp = _py_rule("beta gamma", "containing", "gamma")
    assert {c: h for c, (h, _) in cont.items()} == {c: h for c, (h, _) in exp.items()}

    within = {
        docmap[r.docid]: (r.n_hits, r.score)
        for r in span_within_topk(spark, ix, "gamma", "beta gamma", k=20, cfg=CFG).collect()
    }
    exp_w = _py_rule("gamma", "contained_by", "beta gamma")
    assert {c: h for c, (h, _) in within.items()} == {c: h for c, (h, _) in exp_w.items()}
    assert within  # the corpus has gamma inside beta-gamma spans
