"""ES ``regexp`` term queries (anchored Java-regex over analyzed terms)
expanded from the term dictionary, scored best-expansion BM25 — verified
against a pure-Python reference and against wildcard_topk on patterns
expressible in both languages."""

from __future__ import annotations

import re
from datetime import datetime

import numpy as np
import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.operators.query import regexp_topk, wildcard_topk
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.oracle import build_oracle_index, idf as oracle_idf
from mysql_es_spark.plans.build import build_index

CFG = IndexConfig(n_buckets=2, wave_size=2, salt_docs=4, term_buckets=4, block_size=4)

DOCS = [
    ("c0", "spark streaming query engine"),
    ("c1", "spork and spoon"),
    ("c2", "sparks fly upward"),
    ("c3", "quern stone mill"),
    ("c4", "query query query"),
    ("c5", "unrelated words entirely"),
    ("c6", "walking talking working"),
]


@pytest.fixture(scope="module")
def rx_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rx") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, CFG)
    return d


def _py_regexp(regex: str, max_expansions=50):
    ix = build_oracle_index([(i, t) for i, (_c, t) in enumerate(DOCS)])
    rx = re.compile("^" + regex.lower() + "$")
    cand = sorted(
        ((v, len(ix.postings[v][0])) for v in ix.postings if rx.match(v)),
        key=lambda x: (-x[1], x[0]),
    )[:max_expansions]
    out = {}
    for i, (cid, text) in enumerate(DOCS):
        toks = tokenize_text(text)
        best = 0.0
        for v, df in cand:
            if v not in toks:
                continue
            docids, tfs = ix.postings[v]
            tf = float(tfs[np.searchsorted(docids, i)])
            norm = tf / (tf + ix.k1 * (1 - ix.b + ix.b * ix.dl[i] / ix.avgdl))
            best = max(best, oracle_idf(ix.n_docs, df) * norm)
        if best > 0:
            out[cid] = round(best, 6)
    return out


@pytest.mark.parametrize(
    "regex",
    [
        "sp[ao]rk",          # char class
        "quer[ny]",          # char class tail
        "s.*k",              # any run
        "(walk|talk|work)ing",  # alternation group
        "query|quern",       # top-level alternation
        "wor.{4}",           # counted any
        "zz+",               # no match
    ],
)
def test_regexp_matches_python_reference(spark, rx_index, regex):
    rows = regexp_topk(spark, rx_index, regex, k=50, cfg=CFG, with_keys=True).collect()
    got = {r.conv_id: round(r.score, 6) for r in rows}
    assert got == _py_regexp(regex)


def test_regexp_equals_wildcard_on_shared_patterns(spark, rx_index):
    """A wildcard pattern and its regex translation rank identically."""
    w = wildcard_topk(spark, rx_index, "sp*k", k=50, cfg=CFG, with_keys=True).collect()
    r = regexp_topk(spark, rx_index, "sp.*k", k=50, cfg=CFG, with_keys=True).collect()
    assert [(x.conv_id, round(x.score, 6)) for x in w] == [
        (x.conv_id, round(x.score, 6)) for x in r
    ]


def test_regexp_literal_prefix_extraction(spark, rx_index):
    """A pattern with a literal head must behave identically to the same
    pattern evaluated without prefix pushdown (correctness of the
    StartsWith shortcut), including when the prefix eliminates rows."""
    got = {
        r.conv_id
        for r in regexp_topk(spark, rx_index, "quer[ny]", k=50, cfg=CFG, with_keys=True)
        .collect()
    }
    assert got == {"c0", "c3", "c4"}
    # metachar-at-start → no prefix filter, still correct
    got2 = {
        r.conv_id
        for r in regexp_topk(spark, rx_index, "[st]alking", k=50, cfg=CFG, with_keys=True)
        .collect()
    }
    assert got2 == {"c6"}
