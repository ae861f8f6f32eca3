"""Highlighting: term wrapping, boundaries, case, fragments, DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest

from mysql_es_spark.operators.highlight import (
    duckdb_highlight_expr,
    highlight_fragment,
    highlight_terms,
)
from mysql_es_spark.sources.tables import local_rows_df

ROWS = [
    (1, "Spark joins the query planner"),
    (2, "sparkly things do not match spark-adjacent words like sparks"),
    (3, "JOIN and join and Join"),
    (4, "nothing relevant here"),
    (5, None),
]


@pytest.fixture(scope="module")
def df(spark):
    return local_rows_df(spark, ROWS, "id long, text string")


def test_whole_field_highlight(spark, df):
    out = {r.id: r.highlight for r in highlight_terms(df, ["spark", "join"]).collect()}
    # whole-token match only: 'joins' is a different token to the analyzer
    # (no stemming), so it is not wrapped — consistent with BM25 matching
    assert out[1] == "<em>Spark</em> joins the query planner"
    # word boundary: 'sparkly'/'sparks' untouched, bare 'spark' wrapped
    assert out[2] == "sparkly things do not match <em>spark</em>-adjacent words like sparks"
    assert out[3] == "<em>JOIN</em> and <em>join</em> and <em>Join</em>"
    assert out[4] == "nothing relevant here"
    assert out[5] is None


def test_longest_alternative_wins(spark, df):
    rows = local_rows_df(spark, [(1, "querying the query")], "id long, text string")
    out = highlight_terms(rows, ["query", "querying"]).collect()[0].highlight
    assert out == "<em>querying</em> the <em>query</em>"


def test_fragment_centers_first_match(spark):
    long_text = ("x " * 200) + "the spark keyword sits here" + (" y" * 200)
    rows = local_rows_df(spark, [(1, long_text)], "id long, text string")
    frag = highlight_fragment(rows, ["spark"], size=60).collect()[0].highlight
    assert "<em>spark</em>" in frag
    assert len(frag) <= 60 + len("<em></em>")


def test_fragment_no_match_returns_head(spark):
    rows = local_rows_df(spark, [(1, "plain text with no hits at all")], "id long, text string")
    frag = highlight_fragment(rows, ["zzz"], size=10).collect()[0].highlight
    assert frag == "plain text"


def test_duckdb_parity(spark, df):
    got = {r.id: r.highlight for r in highlight_terms(df, ["spark", "join"]).collect()}
    con = duckdb.connect()
    expr = duckdb_highlight_expr(["spark", "join"])
    for rid, text in ROWS:
        if text is None:
            continue
        want = con.sql(f"SELECT {expr} FROM (SELECT ? AS text)", params=[text]).fetchone()[0]
        assert got[rid] == want, (rid, got[rid], want)
