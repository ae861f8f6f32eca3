"""query_string: parser semantics and index evaluation vs a Python oracle."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.functions.querystring import (
    QueryStringError,
    ast_terms,
    ast_to_column,
    parse_query_string,
)
from mysql_es_spark.operators.query import query_string_topk
from tests.conftest import TEST_CFG


def _py_eval(qs: str, toks: set[str], default_and=False) -> bool:
    ast = parse_query_string(qs, default_and=default_and)
    return bool(ast_to_column(ast, lambda t: t in toks))


def test_parser_semantics():
    assert _py_eval("a AND b", {"a", "b"})
    assert not _py_eval("a AND b", {"a"})
    assert _py_eval("a OR b", {"b"})
    assert _py_eval("a b", {"b"})  # juxtaposition = OR by default
    assert not _py_eval("a b", {"b"}, default_and=True)
    assert _py_eval("a AND (b OR c)", {"a", "c"})
    assert not _py_eval("a AND (b OR c) -d", {"a", "c", "d"})
    assert _py_eval("a AND NOT (b AND c)", {"a", "b"})
    with pytest.raises(QueryStringError):
        parse_query_string("-a")  # pure negative
    with pytest.raises(QueryStringError):
        parse_query_string("a AND (b OR")  # malformed
    with pytest.raises(QueryStringError):
        parse_query_string("a AND b c")  # ambiguous mixing
    pos, neg = ast_terms(parse_query_string("a AND (b OR c) -d"))
    assert pos == {"a", "b", "c"} and neg == {"d"}


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    return {r.docid: r.text for r in rows}


def _oracle(fwd, qs, k, default_and=False):
    toks = {d: tokenize_text(t) for d, t in fwd.items()}
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    dfreq = Counter(t for ts in toks.values() for t in set(ts))
    ast = parse_query_string(qs, default_and=default_and)
    pos, _neg = ast_terms(ast)
    out = []
    for d, ts in toks.items():
        tset = set(ts)
        if not bool(ast_to_column(ast, lambda t: t in tset)):
            continue
        tf = Counter(ts)
        s = 0.0
        for t in pos:
            if t in tf:
                w = float(np.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)))
                s += w * tf[t] / (tf[t] + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
        out.append((d, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize(
    "qs",
    [
        "w0 AND (w3 OR w5) -w7",
        "w0 OR w1",
        "(w0 OR w2) AND (w3 OR w5) AND NOT (w7 AND w9)",
        "w0 AND zzznope OR w3",  # unknown term can never match
    ],
)
def test_query_string_matches_oracle(spark, built_index, fwd, qs):
    want = _oracle(fwd, qs, 12)
    got = query_string_topk(spark, built_index, qs, k=12, cfg=TEST_CFG).collect()
    assert [r.docid for r in got] == [d for d, _ in want], qs
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)


def test_query_string_all_unknown_terms(spark, built_index):
    assert query_string_topk(spark, built_index, "zzz1 AND zzz2", k=5, cfg=TEST_CFG).count() == 0
