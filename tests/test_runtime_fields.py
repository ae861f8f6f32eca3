"""Runtime fields (ES runtime_mappings): query-time computed columns in
filter context, sort, and aggregations — validated as pure per-document
transforms, with column pruning still reaching the scan."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.functions.runtime import (
    compile_runtime_fields,
    runtime_source_columns,
)
from mysql_es_spark.operators.aggs import agg_tree
from mysql_es_spark.operators.query import bm25_filtered_topk, sorted_search
from mysql_es_spark.sources import tables as tbl
from tests.conftest import TEST_CFG

Q = "w0 w3"


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_compile_and_shadowing(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "xyz")], "id int, text string")
    out = compile_runtime_fields(
        df, {"text": "upper(text)", "tlen": "length(text)", "id2": "id * 2"}
    )
    got = {r.id: (r.text, r.tlen, r.id2) for r in out.collect()}
    # every expression binds to the ORIGINAL columns: tlen sees the
    # pre-shadow text even though `text` itself is redefined
    assert got == {1: ("AB", 2, 2), 2: ("XYZ", 3, 4)}
    assert runtime_source_columns(df, {"a": "length(text) + id"}) == {"text", "id"}


def test_validation_rejects_impure(spark):
    df = spark.createDataFrame([(1, "ab")], "id int, text string")
    cases = {
        "nondeterministic": {"r": "rand()"},
        "uuid": {"u": "uuid()"},
        "subquery": {"s": "(select max(id) from t)"},
        "aggregate": {"m": "sum(id)"},
        "window": {"w": "row_number() over (order by id)"},
        "generator": {"g": "explode(array(1, 2))"},
        "unknown column": {"x": "nope + 1"},
        "bad name": {"9x": "id"},
        "empty expr": {"e": "  "},
        "non-string": {"n": 42},
    }
    for label, mapping in cases.items():
        with pytest.raises(ValueError):
            compile_runtime_fields(df, mapping)
    # no mappings → the same frame back
    assert compile_runtime_fields(df, {}) is df


def test_filter_context_runtime_field(spark, built_index):
    """A runtime boolean used in filter context equals the inlined
    predicate — same hits, same scores."""
    pred = "role = 'user' AND length(text) > 20"
    plain = bm25_filtered_topk(spark, built_index, Q, pred, k=15, cfg=TEST_CFG)
    rt = bm25_filtered_topk(
        spark, built_index, Q, "is_long_user", k=15, cfg=TEST_CFG,
        runtime_mappings={"is_long_user": pred},
    )
    assert _rows(plain) == _rows(rt) and plain.count() > 0


def test_sorted_search_runtime_field(spark, built_index):
    """Sorting on a runtime negation asc equals sorting the source field
    desc (ties broken by the same docid asc in both)."""
    a = sorted_search(
        spark, built_index, Q, [("neg_turn", "asc")], size=25,
        runtime_mappings={"neg_turn": "-turn_idx"}, cfg=TEST_CFG,
    )
    b = sorted_search(spark, built_index, Q, [("turn_idx", "desc")], size=25, cfg=TEST_CFG)
    assert [r.docid for r in a.collect()] == [r.docid for r in b.collect()]


def test_agg_tree_runtime_bucket(spark, built_index):
    """Bucketing on a runtime CASE expression matches the same
    aggregation computed by hand over forward ∩ matched docids."""
    rt = {"tool_kind": "CASE WHEN tool IS NULL THEN 'plain' ELSE 'tooled' END"}
    got = agg_tree(
        spark, built_index, Q,
        {"by_kind": {"terms": {"field": "tool_kind", "size": 10}}},
        cfg=TEST_CFG, runtime_mappings=rt,
    )
    from mysql_es_spark.operators.aggs import _matched_docids

    matched = _matched_docids(spark, built_index, Q, TEST_CFG)
    fwd = tbl.read(spark, built_index, "forward").select("docid", "tool")
    want = (
        matched.join(fwd, "docid")
        .withColumn("tool_kind", F.expr(rt["tool_kind"]))
        .groupBy("tool_kind")
        .agg(F.count(F.lit(1)).alias("by_kind_count"))
        .orderBy(F.col("by_kind_count").desc(), F.col("tool_kind").asc())
    )
    assert _rows(got) == _rows(want) and got.count() == 2


def test_column_pruning_through_runtime_fields(spark, built_index):
    """Only the runtime expressions' source columns reach the forward
    scan: a sort on length(text) must not read role/tool/ts."""
    df = sorted_search(
        spark, built_index, Q, [("tlen", "desc")], size=5,
        runtime_mappings={"tlen": "length(text)"}, cfg=TEST_CFG,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    fwd_scans = [
        blk for blk in plan.split("\n\n")
        if "forward" in blk and "ReadSchema" in blk
    ]
    assert fwd_scans, plan
    for blk in fwd_scans:
        schema_line = next(l for l in blk.splitlines() if "ReadSchema" in l)
        assert "text" in schema_line
        for col in ("role", "tool", "ts", "conv_id"):
            assert col not in schema_line, schema_line
