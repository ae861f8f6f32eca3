"""Multi-field index + multi_match vs a per-field Python oracle.

ES semantics under test (multi_match over per-field Lucene indexes,
etc/template.json declares several analyzed fields per type):
- each field scored with its OWN statistics (df, avgdl, N);
- best_fields = max + tie_breaker * (sum - max); most_fields = sum;
- boosts multiply the field score before combination;
- sub-indexes agree on docids by construction (deterministic assignment).
"""

from __future__ import annotations

import math
import shutil

import pytest

from mysql_es_spark.oracle import build_oracle_index, score_query
from mysql_es_spark.plans.multi_field import (
    build_multi_field,
    multi_match_topk,
    stored_fields,
)
from tests.conftest import TEST_CFG

Q = "w3 sql"
BOOSTS = {"text": 1.0, "tool": 2.0}


@pytest.fixture(scope="module")
def mf_root(spark, tiny_transcripts, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mf") / "root")
    shutil.rmtree(d, ignore_errors=True)
    build_multi_field(spark, tiny_transcripts, d, BOOSTS, TEST_CFG)
    return d


@pytest.fixture(scope="module")
def field_scores(spark, mf_root):
    """Python-oracle per-field full score maps keyed by docid."""
    out = {}
    for name in BOOSTS:
        rows = (
            spark.read.parquet(f"{mf_root}/field={name}/forward")
            .select("docid", "text")
            .collect()
        )
        oix = build_oracle_index([(r.docid, r.text) for r in rows])
        out[name] = dict(score_query(oix, Q, k=len(rows)))
    return out


def _combine(field_scores, mtype, tie_breaker, k):
    docids = set()
    for m in field_scores.values():
        docids |= set(m)
    out = []
    for d in docids:
        ss = [BOOSTS[f] * m[d] for f, m in field_scores.items() if d in m]
        if mtype == "most_fields":
            v = sum(ss)
        else:
            v = max(ss) + tie_breaker * (sum(ss) - max(ss))
        out.append((d, v))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize(
    "mtype,tie", [("best_fields", 0.0), ("best_fields", 0.3), ("most_fields", 0.0)]
)
def test_multi_match_matches_oracle(spark, mf_root, field_scores, mtype, tie):
    want = _combine(field_scores, mtype, tie, 15)
    got = multi_match_topk(
        spark, mf_root, Q, k=15, mtype=mtype, tie_breaker=tie, cfg=TEST_CFG
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want], mtype
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)


@pytest.fixture(scope="module")
def term_scores(spark, mf_root):
    """Python-oracle per-(field, term, docid) contribution maps."""
    out = {}
    for name in BOOSTS:
        rows = (
            spark.read.parquet(f"{mf_root}/field={name}/forward")
            .select("docid", "text")
            .collect()
        )
        oix = build_oracle_index([(r.docid, r.text) for r in rows])
        per_t = {}
        for t in ["w3", "sql"]:
            per_t[t] = dict(score_query(oix, t, k=len(rows)))
        out[name] = per_t
    return out


@pytest.mark.parametrize("tie", [0.0, 0.4])
def test_cross_fields_matches_oracle(spark, mf_root, term_scores, tie):
    # term-centric: per (doc, term) dis-max across fields, then sum terms
    per_doc: dict[int, float] = {}
    for t in ["w3", "sql"]:
        docids = set()
        for f in BOOSTS:
            docids |= set(term_scores[f][t])
        for d in docids:
            ss = [BOOSTS[f] * term_scores[f][t][d] for f in BOOSTS if d in term_scores[f][t]]
            per_doc[d] = per_doc.get(d, 0.0) + max(ss) + tie * (sum(ss) - max(ss))
    want = sorted(per_doc.items(), key=lambda x: (-x[1], x[0]))[:15]
    got = multi_match_topk(
        spark, mf_root, Q, k=15, mtype="cross_fields", tie_breaker=tie, cfg=TEST_CFG
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)


def test_both_fields_contribute(field_scores):
    # the query genuinely exercises both fields: 'w3' only matches text,
    # 'sql' only matches tool turns — and some docs match in both fields
    text_only = set(field_scores["text"])
    tool_only = set(field_scores["tool"])
    assert text_only and tool_only
    assert text_only & tool_only, "need docs matching in both fields"


def test_stored_boosts_roundtrip(spark, mf_root):
    assert stored_fields(spark, mf_root) == BOOSTS


def test_validation(spark, mf_root):
    with pytest.raises(ValueError):
        multi_match_topk(spark, mf_root, Q, mtype="blended", cfg=TEST_CFG)
    with pytest.raises(ValueError):
        build_multi_field(spark, None, mf_root, {}, TEST_CFG)
    assert multi_match_topk(spark, mf_root, "", cfg=TEST_CFG).count() == 0


def test_combined_fields_matches_python_reference(spark, mf_root):
    """combined_fields = simple BM25F: weighted tf/dl sums in ONE combined
    statistics space (df over any-field presence, avgdl over combined
    lengths)."""
    from mysql_es_spark.functions.analyze import tokenize_text
    from mysql_es_spark.plans.multi_field import combined_fields_topk

    texts = {}
    for name in BOOSTS:
        rows = (
            spark.read.parquet(f"{mf_root}/field={name}/forward")
            .select("docid", "text")
            .collect()
        )
        texts[name] = {r.docid: tokenize_text(r.text) for r in rows}
    docids = set().union(*[set(m) for m in texts.values()])
    qts = tokenize_text(Q)
    dlc = {
        d: sum(BOOSTS[f] * len(texts[f].get(d, [])) for f in BOOSTS) for d in docids
    }
    n = len(docids)
    avgdl = sum(dlc.values()) / n
    k1, b = TEST_CFG.k1, TEST_CFG.b
    exp = []
    for d in docids:
        s = 0.0
        for t in qts:
            tfc = sum(BOOSTS[f] * texts[f].get(d, []).count(t) for f in BOOSTS)
            if tfc <= 0:
                continue
            df_t = sum(
                1 for d2 in docids if any(t in texts[f].get(d2, []) for f in BOOSTS)
            )
            idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
            s += idf * tfc / (tfc + k1 * (1 - b + b * dlc[d] / avgdl))
        if s > 0:
            exp.append((d, s))
    exp.sort(key=lambda x: (-x[1], x[0]))
    got = combined_fields_topk(spark, mf_root, Q, k=15, cfg=TEST_CFG).collect()
    assert [r.docid for r in got] == [d for d, _ in exp[:15]]
    for r, (_, es) in zip(got, exp):
        assert r.score == pytest.approx(es, abs=1e-9)


def test_combined_fields_unknown_terms_empty(spark, mf_root):
    from mysql_es_spark.plans.multi_field import combined_fields_topk

    assert combined_fields_topk(spark, mf_root, "zzzznope", k=5, cfg=TEST_CFG).count() == 0
