"""_validate/query: compile-without-execute, explain rewrites, error
surfacing (syntax, positional requirements, unknown fields)."""

from __future__ import annotations

from mysql_es_spark.operators.query import validate_query
from tests.conftest import TEST_CFG


def test_validate_match_rewrites_analyzed_terms(spark, built_index):
    out = validate_query(spark, built_index, "match", "Hello, WORLD café", cfg=TEST_CFG)
    assert out["valid"] is True
    assert out["explanation"] == "text:hello text:world text:cafe"


def test_validate_match_empty_analysis(spark, built_index):
    out = validate_query(spark, built_index, "match", "!!! ...", cfg=TEST_CFG)
    assert out["valid"] is True
    assert "MatchNoDocsQuery" in out["explanation"]


def test_validate_phrase_needs_positions(spark, built_index):
    # TEST_CFG builds without positions — phrase must be flagged invalid
    out = validate_query(spark, built_index, "match_phrase", "w0 w3", cfg=TEST_CFG)
    assert out["valid"] is False
    assert "with_positions" in out["error"]
    out = validate_query(spark, built_index, "intervals", "w0 w3", cfg=TEST_CFG)
    assert out["valid"] is False


def test_validate_phrase_ok_on_positional_index(spark, tiny_transcripts, tmp_path_factory):
    import shutil

    from mysql_es_spark.plans.build import build_index

    cfg = TEST_CFG.with_(with_positions=True)
    d = str(tmp_path_factory.mktemp("valix") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, tiny_transcripts, d, cfg)
    out = validate_query(spark, d, "match_phrase", "w0 w3", cfg=cfg)
    assert out == {"valid": True, "explanation": 'text:"w0 w3"'}
    out = validate_query(spark, d, "match_phrase_prefix", "w0 w3", cfg=cfg)
    assert out == {"valid": True, "explanation": 'text:"w0 w3*"'}


def test_validate_query_string(spark, built_index):
    ok = validate_query(spark, built_index, "query_string", "a AND (b OR NOT c)", cfg=TEST_CFG)
    assert ok["valid"] is True
    assert ok["explanation"] == "(text:a AND (text:b OR -(text:c)))"
    bad = validate_query(spark, built_index, "query_string", "a AND (b OR", cfg=TEST_CFG)
    assert bad["valid"] is False and bad["error"]


def test_validate_regexp_prefix_exists(spark, built_index):
    assert validate_query(spark, built_index, "regexp", "w[0-9]+", cfg=TEST_CFG)["valid"]
    bad = validate_query(spark, built_index, "regexp", "w[0-9", cfg=TEST_CFG)
    assert bad["valid"] is False and "regexp" in bad["error"]
    assert validate_query(spark, built_index, "prefix", "Sca", cfg=TEST_CFG) == {
        "valid": True, "explanation": "text:sca*",
    }
    two = validate_query(spark, built_index, "prefix", "two tokens", cfg=TEST_CFG)
    assert two["valid"] is False
    assert validate_query(spark, built_index, "exists", "role", cfg=TEST_CFG)["valid"]
    missing = validate_query(spark, built_index, "exists", "nope", cfg=TEST_CFG)
    assert missing["valid"] is False and "nope" in missing["error"]
    unk = validate_query(spark, built_index, "geo_distance", "x", cfg=TEST_CFG)
    assert unk["valid"] is False
