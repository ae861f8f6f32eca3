"""The index is self-describing: the build persists its IndexConfig
(index_meta table) and the query side uses it as ground truth, so a
caller who omits — or re-supplies the WRONG — build flags still gets
correct results (the reference analog: ES stores the mapping with the
index; clients never re-declare it per query)."""

from __future__ import annotations

from conftest import TEST_CFG

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.operators.query import (
    bm25_topk,
    effective_config,
    phrase_topk,
    prefix_topk,
)


def _pairs(rows):
    return [(r["docid"], round(r["score"], 9)) for r in rows]


def test_effective_config_roundtrip(spark, built_index):
    got = effective_config(spark, built_index, None)
    for f in ("n_buckets", "salt_docs", "term_buckets", "block_size", "with_positions"):
        assert getattr(got, f) == getattr(TEST_CFG, f), f


def test_query_without_cfg_matches_explicit(spark, built_index):
    explicit = bm25_topk(spark, built_index, "w0 w3", k=5, cfg=TEST_CFG, mode="pruned")
    implicit = bm25_topk(spark, built_index, "w0 w3", k=5, mode="pruned")
    assert _pairs(explicit.collect()) == _pairs(implicit.collect())


def test_wrong_caller_cfg_is_overridden(spark, built_index):
    # term_buckets/salt_docs lies that would return empty/wrong results if
    # trusted; the persisted meta must win
    wrong = IndexConfig(n_buckets=64, salt_docs=1, term_buckets=999, block_size=7)
    good = bm25_topk(spark, built_index, "w0 w3", k=5, cfg=TEST_CFG, mode="pruned")
    lied = bm25_topk(spark, built_index, "w0 w3", k=5, cfg=wrong, mode="pruned")
    assert _pairs(good.collect()) == _pairs(lied.collect())


def test_query_knobs_still_honored(spark, built_index):
    # max_driver_salts=0 forces the distributed salt-selection path; the
    # caller's query-time knob must survive the physical-field override
    forced = bm25_topk(
        spark, built_index, "w0 w3", k=5,
        cfg=TEST_CFG.with_(max_driver_salts=0), mode="pruned",
    )
    normal = bm25_topk(spark, built_index, "w0 w3", k=5, mode="pruned")
    assert _pairs(forced.collect()) == _pairs(normal.collect())


def test_prefix_and_phrase_load_meta(spark, built_index):
    # no cfg passed at all: prefix works off the persisted meta; phrase
    # correctly reports the positionless layout
    assert prefix_topk(spark, built_index, "w1", k=5).count() == 5
    try:
        phrase_topk(spark, built_index, "w0 w3", k=5).collect()
        raise AssertionError("expected ValueError on positionless index")
    except ValueError:
        pass


def test_index_mapping(spark, built_index):
    from mysql_es_spark.operators.query import index_mapping

    m = index_mapping(spark, built_index)
    assert m["fields"]["text"] == "string" and m["fields"]["docid"] == "bigint"
    assert m["similarity"] == {"type": "BM25", "k1": 1.2, "b": 0.75}
    assert m["with_positions"] is False
    assert m["physical"]["n_buckets"] == 4
    assert "edge_ngram" not in m["analyzer"]


def test_cli_mapping(spark, built_index, capsys):
    import json

    from mysql_es_spark.cli import main as cli_main

    assert cli_main(["mapping", "--index-dir", built_index]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["fields"]["conv_id"] == "string"
    assert out["physical"]["salt_docs"] == 256


def test_disk_usage_footers_account_all_tables(spark, built_index):
    from mysql_es_spark.operators.query import disk_usage, index_stats

    du = disk_usage(spark, built_index)
    st = index_stats(spark, built_index)
    for table in ("postings", "forward", "doc_lens", "term_dict"):
        assert du[table]["n_files"] > 0
        assert du[table]["total_bytes"] > 0
        # footer-accounted compressed bytes can't exceed the file bytes
        assert du[table]["total_bytes"] <= st[f"{table}_bytes"]
    # the blob column owns the postings bytes; text owns the forward bytes
    assert max(du["postings"]["fields"], key=du["postings"]["fields"].get) == "blob"
    assert "text" in du["forward"]["fields"]
    assert du["all_fields_bytes"] == sum(
        du[t]["total_bytes"] for t in ("postings", "forward", "doc_lens", "term_dict")
    )
