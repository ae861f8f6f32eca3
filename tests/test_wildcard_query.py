"""Wildcard term queries (* and ?) expanded from the term dictionary,
scored best-expansion BM25 — verified against a pure-Python reference."""

from __future__ import annotations

import re
from datetime import datetime

import numpy as np
import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import wildcard_topk
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
def wc_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wc") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, CFG)
    return d


def _py_wildcard(pattern: str, max_expansions=50):
    ix = build_oracle_index([(i, t) for i, (_c, t) in enumerate(DOCS)])
    rx = re.compile(
        "^"
        + "".join(".*" if c == "*" else ("." if c == "?" else re.escape(c))
                  for c in pattern.lower())
        + "$"
    )
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
    "pattern",
    ["sp*k", "?uery", "spark*", "*ing", "w*ing", "qu?r?", "nomatch*"],
)
def test_wildcard_matches_python_reference(spark, wc_index, pattern):
    rows = wildcard_topk(spark, wc_index, pattern, k=50, cfg=CFG, with_keys=True).collect()
    got = {r.conv_id: round(r.score, 6) for r in rows}
    assert got == _py_wildcard(pattern)


def test_wildcard_prefix_pushdown_plan(spark, wc_index):
    """The literal prefix reaches the term_dict scan as a StartsWith
    pushed filter (range scan, not a full-dictionary regex pass)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F
    from mysql_es_spark.sources import tables as tbl

    td = spark.read.parquet(tbl.p(wc_index, "term_dict")).filter(
        F.col("term").startswith("spa") & F.col("term").rlike("^spa.*k$")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        td.explain(True)
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "StartsWith(term,spa)" in plan.replace(" ", "")
