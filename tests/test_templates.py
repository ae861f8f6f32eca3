"""Search templates: mustache-subset rendering + per-index stored store,
and a rendered template driving the query engine end-to-end."""

from __future__ import annotations

import pytest

from mysql_es_spark.functions.templates import (
    get_template,
    put_template,
    render_stored,
    render_template,
)
from mysql_es_spark.operators.query import query_string_topk
from tests.conftest import TEST_CFG


def test_variable_and_default():
    assert render_template("q: {{q}}", {"q": "w0 w1"}) == "q: w0 w1"
    assert render_template("k={{k}}{{^k}}10{{/k}}", {}) == "k=10"
    assert render_template("k={{k}}{{^k}}10{{/k}}", {"k": 25}) == "k=25"
    with pytest.raises(KeyError):
        render_template("{{missing}}", {})


def test_tojson_and_section():
    assert (
        render_template("terms={{#toJson}}ts{{/toJson}}", {"ts": ["b", "a"]})
        == 'terms=["b", "a"]'
    )
    t = "w0{{#extra}} AND {{extra}}{{/extra}}"
    assert render_template(t, {}) == "w0"
    assert render_template(t, {"extra": "w3"}) == "w0 AND w3"


def test_store_roundtrip_and_replace(spark, built_index):
    put_template(spark, built_index, "t1", "{{a}} OR {{b}}")
    put_template(spark, built_index, "t2", "NOT {{a}}")
    assert get_template(spark, built_index, "t1") == "{{a}} OR {{b}}"
    put_template(spark, built_index, "t1", "{{a}} AND {{b}}")
    assert get_template(spark, built_index, "t1") == "{{a}} AND {{b}}"
    assert render_stored(spark, built_index, "t1", {"a": "w0", "b": "w3"}) == "w0 AND w3"
    with pytest.raises(KeyError):
        get_template(spark, built_index, "nope")


def test_rendered_template_drives_search(spark, built_index):
    put_template(spark, built_index, "find", "{{a}} AND {{b}}")
    q = render_stored(spark, built_index, "find", {"a": "w0", "b": "w3"})
    via_template = query_string_topk(spark, built_index, q, k=8, cfg=TEST_CFG).collect()
    direct = query_string_topk(spark, built_index, "w0 AND w3", k=8, cfg=TEST_CFG).collect()
    assert [(r.docid, r.score) for r in via_template] == [
        (r.docid, r.score) for r in direct
    ]
    assert via_template


def test_msearch_template_matches_plain_msearch(spark, built_index):
    from mysql_es_spark.functions.templates import msearch_template
    from mysql_es_spark.operators.query import bm25_topk_multi

    put_template(spark, built_index, "simple", "{{q}}")
    put_template(spark, built_index, "pair", "{{a}} {{b}}")
    got = msearch_template(
        spark, built_index,
        {"x": ("simple", {"q": "w0 w3"}), "y": ("pair", {"a": "w1", "b": "w5"})},
        k=6, cfg=TEST_CFG,
    ).collect()
    want = bm25_topk_multi(
        spark, built_index, {"x": "w0 w3", "y": "w1 w5"}, k=6, cfg=TEST_CFG,
        order_round=4,
    ).collect()
    key = lambda r: (r.qid, r.rank)
    assert [(r.qid, r.docid, round(r.score, 9)) for r in sorted(got, key=key)] == [
        (r.qid, r.docid, round(r.score, 9)) for r in sorted(want, key=key)
    ]
    assert got
