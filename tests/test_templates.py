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
