"""ES nested aggregations (``agg_tree``): terms buckets with metric
sub-aggs and per-parent child truncation — verified against a pure-Python
oracle over the forward table, matching ES semantics exactly (top-size by
doc count within the parent, tie on key asc; metrics over ALL bucket docs
even when child buckets are truncated; null keys dropped)."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.aggs import agg_tree, _parse_agg_tree
from mysql_es_spark.operators.query import query_terms
from tests.conftest import TEST_CFG

Q = "w0 w3"


@pytest.fixture(scope="module")
def fwd_rows(spark, built_index):
    rows = (
        spark.read.parquet(f"{built_index}/forward")
        .select("docid", "role", "tool", "text")
        .collect()
    )
    qt = set(query_terms(Q))
    return [
        (r.role, r.tool, len(tokenize_text(r.text)))
        for r in rows
        if qt & set(tokenize_text(r.text))
    ]


def _py_tree(rows, size1, size2):
    """(role, count, avg_dl, tool, count, max_dl) rows per ES semantics."""
    by_role = Counter(role for role, _t, _dl in rows if role is not None)
    top_roles = sorted(by_role.items(), key=lambda kv: (-kv[1], kv[0]))[:size1]
    out = []
    for role, rc in top_roles:
        dls = [dl for r, _t, dl in rows if r == role]
        avg_dl = sum(dls) / len(dls)
        by_tool = Counter(t for r, t, _dl in rows if r == role and t is not None)
        for tool, tc in sorted(by_tool.items(), key=lambda kv: (-kv[1], kv[0]))[:size2]:
            mx = max(dl for r, t, dl in rows if r == role and t == tool)
            out.append((role, rc, round(avg_dl, 4), tool, tc, mx))
    return sorted(out)


@pytest.mark.parametrize("size1,size2", [(2, 2), (3, 1), (10, 10)])
def test_agg_tree_matches_python_oracle(spark, built_index, fwd_rows, size1, size2):
    spec = {
        "by_role": {
            "terms": {"field": "role", "size": size1},
            "aggs": {
                "avg_dl": {"avg": {"field": "dl"}},
                "by_tool": {
                    "terms": {"field": "tool", "size": size2},
                    "aggs": {"max_dl": {"max": {"field": "dl"}}},
                },
            },
        }
    }
    rows = agg_tree(spark, built_index, Q, spec, cfg=TEST_CFG).collect()
    got = sorted(
        (r.role, r.by_role_count, round(r.avg_dl, 4), r.tool, r.by_tool_count, r.max_dl)
        for r in rows
    )
    assert got == _py_tree(fwd_rows, size1, size2)


def test_agg_tree_single_level_metrics(spark, built_index, fwd_rows):
    spec = {
        "langs": {
            "terms": {"field": "role", "size": 100},
            "aggs": {
                "sum_dl": {"sum": {"field": "dl"}},
                "n_tools": {"cardinality": {"field": "tool"}},
                "with_tool": {"value_count": {"field": "tool"}},
            },
        }
    }
    rows = agg_tree(spark, built_index, Q, spec, cfg=TEST_CFG).collect()
    want_cnt = Counter(r for r, _t, _dl in fwd_rows if r is not None)
    want_sum = defaultdict(int)
    want_tools = defaultdict(set)
    want_vc = Counter()
    for role, tool, dl in fwd_rows:
        if role is None:
            continue
        want_sum[role] += dl
        if tool is not None:
            want_tools[role].add(tool)
            want_vc[role] += 1
    got = {r.role: (r.langs_count, r.sum_dl, r.n_tools, r.with_tool) for r in rows}
    assert got == {
        role: (c, want_sum[role], len(want_tools[role]), want_vc[role])
        for role, c in want_cnt.items()
    }


def test_agg_tree_parent_metrics_cover_truncated_children(spark, built_index, fwd_rows):
    """size=1 on the child level must not change parent counts/metrics."""
    def spec(size2):
        return {
            "by_role": {
                "terms": {"field": "role", "size": 100},
                "aggs": {
                    "avg_dl": {"avg": {"field": "dl"}},
                    "by_tool": {"terms": {"field": "tool", "size": size2}},
                },
            }
        }

    wide = {
        (r.role): (r.by_role_count, round(r.avg_dl, 4))
        for r in agg_tree(spark, built_index, Q, spec(100), cfg=TEST_CFG).collect()
    }
    narrow = {
        (r.role): (r.by_role_count, round(r.avg_dl, 4))
        for r in agg_tree(spark, built_index, Q, spec(1), cfg=TEST_CFG).collect()
    }
    assert narrow == wide


def test_agg_tree_empty_query(spark, built_index):
    spec = {"by_role": {"terms": {"field": "role"}}}
    out = agg_tree(spark, built_index, "zzznotaterm", spec, cfg=TEST_CFG)
    assert out.count() == 0
    assert out.columns == ["role", "by_role_count"]


def test_parse_rejects_bad_specs():
    with pytest.raises(ValueError):
        _parse_agg_tree({"a": {"terms": {"field": "x"}}, "b": {"terms": {"field": "y"}}})
    with pytest.raises(ValueError):
        _parse_agg_tree({"a": {"avg": {"field": "x"}}})
    with pytest.raises(ValueError):
        _parse_agg_tree(
            {"a": {"terms": {"field": "x"},
                   "aggs": {"m": {"median_absolute_deviation": {"field": "y"}}}}}
        )
