"""Ingest pipelines: ES processor chain as Catalyst column algebra."""

from __future__ import annotations

import pytest

from mysql_es_spark.operators.ingest import apply_pipeline


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "  Hello WORLD 42 ", "en", "2024-03-01"),
            (2, "spam spam 7", "xx", "2024-03-02"),
            (3, "Fin Text 9", "fr", "2024-03-03"),
        ],
        "doc_id long, text string, lang string, day string",
    )


def test_pipeline_order_and_transforms(spark, df):
    out = apply_pipeline(
        df,
        [
            {"drop": {"if": "lang = 'xx'"}},
            {"trim": {"field": "text"}},
            {"lowercase": {"field": "text"}},
            {"gsub": {"field": "text", "pattern": "[0-9]+", "replacement": "#"}},
            {"copy": {"field": "lang", "target_field": "lang_raw"}},
            {"rename": {"field": "lang", "target_field": "language"}},
            {"set": {"field": "source", "value": "ingest"}},
            {"date": {"field": "day", "target_field": "ts", "format": "yyyy-MM-dd"}},
            {"remove": {"field": "day"}},
            {"convert": {"field": "doc_id", "type": "int"}},
        ],
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 3}
    assert rows[1].text == "hello world #"
    assert rows[1].language == "en" and rows[1].lang_raw == "en"
    assert rows[1].source == "ingest"
    assert str(rows[1].ts).startswith("2024-03-01")
    assert dict(out.dtypes)["doc_id"] == "int"
    assert "day" not in out.columns and "lang" not in out.columns


def test_pipeline_validation(spark, df):
    with pytest.raises(ValueError, match="unknown field"):
        apply_pipeline(df, [{"remove": {"field": "nope"}}])
    with pytest.raises(ValueError, match="exists"):
        apply_pipeline(df, [{"rename": {"field": "text", "target_field": "lang"}}])
    with pytest.raises(ValueError, match="unknown processor"):
        apply_pipeline(df, [{"frobnicate": {"field": "text"}}])
    with pytest.raises(ValueError, match="script"):
        apply_pipeline(df, [{"script": {"source": "ctx.x = 1"}}])
    with pytest.raises(ValueError, match="exactly one key"):
        apply_pipeline(df, [{"set": {"field": "a", "value": 1}, "remove": {"field": "b"}}])


def test_pipeline_is_pure_jvm(spark, df):
    import contextlib
    import io

    out = apply_pipeline(
        df,
        [
            {"lowercase": {"field": "text"}},
            {"gsub": {"field": "text", "pattern": "l+", "replacement": "L"}},
            {"drop": {"if": "lang = 'xx'"}},
        ],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_simulate_pipeline_matches_apply(spark):
    from mysql_es_spark.operators.ingest import apply_pipeline, simulate_pipeline

    procs = [
        {"set": {"field": "kind", "value": "turn"}},
        {"uppercase": {"field": "role"}},
        {"rename": {"field": "txt", "target_field": "text"}},
    ]
    docs = [
        {"role": "user", "txt": "hello there"},
        {"role": "tool", "txt": "ls -la"},
    ]
    got = simulate_pipeline(spark, procs, docs)
    assert got == [
        {"role": "USER", "text": "hello there", "kind": "turn"},
        {"role": "TOOL", "text": "ls -la", "kind": "turn"},
    ]
    with pytest.raises(ValueError, match="field set"):
        simulate_pipeline(spark, procs, [{"a": 1}, {"b": 2}])
    assert simulate_pipeline(spark, procs, []) == []
