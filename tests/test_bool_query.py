"""ES bool queries over the posting index: must / should / must_not with
minimum_should_match, BM25-scored in query context, filter context for
must_not — verified against a pure-Python reference on the same corpus,
plus the degenerate-form identities (only-must == conjunctive,
only-should == disjunctive, only-must_not == rest-of-corpus filter)."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import (
    bm25_bool_topk,
    bm25_topk,
    bm25_topk_conjunctive,
)
from mysql_es_spark.oracle import build_oracle_index, idf as oracle_idf
from mysql_es_spark.plans.build import build_index

CFG = IndexConfig(n_buckets=2, wave_size=2, salt_docs=4, term_buckets=4, block_size=4)

DOCS = [
    ("c0", "spark join query engine"),
    ("c1", "spark query window"),
    ("c2", "spark batch pipeline"),
    ("c3", "join window agg"),
    ("c4", "spark join window batch"),
    ("c5", "unrelated words entirely"),
    ("c6", "spark spark spark join"),
    ("c7", ""),  # zero-token doc: counts in N/avgdl, matches nothing
]


@pytest.fixture(scope="module")
def bool_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("boolq") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, CFG)
    fwd = spark.read.parquet(f"{d}/forward").select("docid", "conv_id").collect()
    return d, {r.conv_id: r.docid for r in fwd}


def _py_bool(must, should, must_not, msm=None):
    """Reference result {conv_id: score} from the NumPy oracle's stats."""
    ix = build_oracle_index(
        [(i, text) for i, (_cid, text) in enumerate(DOCS)]
    )
    tm, tx = tokenize_text(must), tokenize_text(must_not)
    ts = [t for t in tokenize_text(should) if t not in set(tm)]
    if msm is None:
        msm = 1 if not tm and ts else 0
    out = {}
    for i, (cid, text) in enumerate(DOCS):
        toks = set(tokenize_text(text))
        if any(t not in toks for t in tm) or any(t in toks for t in tx):
            continue
        hit_s = [t for t in ts if t in toks]
        if len(hit_s) < msm:
            continue
        score = 0.0
        for t in tm + hit_s:
            docids, tfs = ix.postings[t]
            tf = float(tfs[np.searchsorted(docids, i)])
            dl = ix.dl[i]
            norm = tf / (tf + ix.k1 * (1 - ix.b + ix.b * dl / ix.avgdl))
            score += oracle_idf(ix.n_docs, len(docids)) * norm
        out[cid] = round(score, 6)
    return out


def _run(spark, ix, keys, **kw):
    rows = bm25_bool_topk(spark, ix, k=50, with_keys=True, cfg=CFG, **kw).collect()
    return {r.conv_id: round(r.score, 6) for r in rows}


@pytest.mark.parametrize(
    "must,should,must_not,msm",
    [
        ("spark", "join query window", "batch", None),
        ("spark join", "", "", None),                 # pure conjunction
        ("", "spark join window", "", None),          # pure disjunction msm=1
        ("", "spark join window", "", 2),             # at least 2 of 3
        ("spark", "join query", "", 2),               # must + msm both bind
        ("spark", "", "batch window", None),          # two exclusions
        ("", "spark", "join", 1),
    ],
)
def test_bool_matches_python_reference(spark, bool_index, must, should, must_not, msm):
    ix, keys = bool_index
    got = _run(spark, ix, keys, must=must, should=should, must_not=must_not,
               minimum_should_match=msm)
    assert got == _py_bool(must, should, must_not, msm)


def test_bool_degenerate_identities(spark, bool_index):
    ix, _keys = bool_index
    conj = {
        r.docid: round(r.score, 9)
        for r in bm25_topk_conjunctive(spark, ix, "spark join", k=50, cfg=CFG).collect()
    }
    bool_m = {
        r.docid: round(r.score, 9)
        for r in bm25_bool_topk(spark, ix, must="spark join", k=50, cfg=CFG).collect()
    }
    assert bool_m == conj
    disj = {
        r.docid: round(r.score, 9)
        for r in bm25_topk(spark, ix, "spark join", k=50, cfg=CFG, mode="simple").collect()
    }
    bool_s = {
        r.docid: round(r.score, 9)
        for r in bm25_bool_topk(spark, ix, should="spark join", k=50, cfg=CFG).collect()
    }
    assert bool_s == disj


def test_bool_filter_context_only_must_not(spark, bool_index):
    ix, keys = bool_index
    got = _run(spark, ix, keys, must_not="spark")
    want = {
        cid: 0.0
        for cid, text in DOCS
        if "spark" not in set(tokenize_text(text))
    }
    assert got == want  # includes the zero-token doc c7


def test_bool_empty_cases(spark, bool_index):
    ix, _keys = bool_index
    # required term absent from corpus
    assert bm25_bool_topk(spark, ix, must="zzzmissing", cfg=CFG).count() == 0
    # msm above the number of matchable should clauses
    assert (
        bm25_bool_topk(
            spark, ix, should="spark zzzmissing", minimum_should_match=2, cfg=CFG
        ).count()
        == 0
    )
    # no clauses at all
    assert bm25_bool_topk(spark, ix, cfg=CFG).count() == 0


def test_bool_should_contributes_beyond_msm(spark, bool_index):
    """A doc matching more should terms than msm scores higher than the
    same doc would with only msm of them — optional clauses add score."""
    ix, keys = bool_index
    got = _run(spark, ix, keys, must="spark", should="join window", minimum_should_match=1)
    ref = _py_bool("spark", "join window", "", 1)
    assert got == ref
    # c4 matches join AND window; its score strictly exceeds its
    # must-only conjunctive score
    conj = _run(spark, ix, keys, must="spark")
    assert got["c4"] > conj["c4"]
