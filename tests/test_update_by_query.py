"""ES _update_by_query: scripted column updates over matched live docs,
made searchable via affected-bucket rebuild — text updates re-score, the
matched set is exact, deleted docs never resurrect, identities immutable."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import bm25_topk
from mysql_es_spark.oracle import build_oracle_index, score_query
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.plans.deletes import delete_by_query, update_by_query
from tests.conftest import TEST_CFG

UPD_Q = "w5"  # update every doc containing this term


@pytest.fixture()
def upd_index(spark, tiny_transcripts, tmp_path_factory):
    """Function-scoped fresh index (mutated by each test) + its rows."""
    d = str(tmp_path_factory.mktemp("updix") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, tiny_transcripts, d, TEST_CFG)
    rows = (
        spark.read.parquet(f"{d}/forward")
        .select("docid", "conv_id", "turn_idx", "role", "tool", "text")
        .collect()
    )
    return d, rows


def test_metadata_update_exact_set_and_scores_stable(spark, upd_index):
    d, rows = upd_index
    res = update_by_query(
        spark, d, {"tool": "'flagged'"}, query=UPD_Q, cfg=TEST_CFG
    )
    want = {r.docid for r in rows if UPD_Q in set(tokenize_text(r.text))}
    assert res["docs_updated"] == len(want) > 0
    got = {
        r.docid: r.tool
        for r in spark.read.parquet(f"{d}/forward").select("docid", "tool").collect()
    }
    assert {doc for doc, t in got.items() if t == "flagged"} == want
    # text untouched → ranking byte-identical to the pre-update oracle
    oix = build_oracle_index([(r.docid, r.text) for r in rows])
    top = bm25_topk(spark, d, "w0 w3", k=10, cfg=TEST_CFG, mode="pruned").collect()
    assert [(r.docid, round(r.score, 6)) for r in top] == [
        (doc, round(s, 6)) for doc, s in score_query(oix, "w0 w3", k=10)
    ]


def test_text_update_reindexes_and_rescores(spark, upd_index):
    d, rows = upd_index
    res = update_by_query(
        spark, d, {"text": "concat(text, ' zzznewterm')"}, query=UPD_Q, cfg=TEST_CFG
    )
    updated = {r.docid for r in rows if UPD_Q in set(tokenize_text(r.text))}
    # a small update-only batch may ride the round-3 posting-merge fast
    # path (waves_merged) instead of the wave rebuild — either way the
    # searchability + rank-identity asserts below prove the result
    assert res["docs_updated"] == len(updated) > 0
    assert res["waves_rebuilt"] or res.get("waves_merged")
    # the appended term is now searchable and hits exactly the updated docs
    hits = bm25_topk(
        spark, d, "zzznewterm", k=len(rows), cfg=TEST_CFG, mode="simple"
    ).collect()
    assert {r.docid for r in hits} == updated
    # full rank identity vs an oracle over the UPDATED corpus
    new_text = {
        r.docid: (r.text + " zzznewterm") if r.docid in updated else r.text
        for r in rows
    }
    oix = build_oracle_index(sorted(new_text.items()))
    for q in ("w0 w3", "zzznewterm w1"):
        top = bm25_topk(spark, d, q, k=15, cfg=TEST_CFG, mode="pruned").collect()
        assert [(r.docid, round(r.score, 6)) for r in top] == [
            (doc, round(s, 6)) for doc, s in score_query(oix, q, k=15)
        ], q


def test_docids_stable_for_unchanged_docs(spark, upd_index):
    d, rows = upd_index
    before = {(r.conv_id, r.turn_idx): r.docid for r in rows}
    update_by_query(spark, d, {"tool": "'x'"}, query=UPD_Q, cfg=TEST_CFG)
    after = {
        (r.conv_id, r.turn_idx): r.docid
        for r in spark.read.parquet(f"{d}/forward")
        .select("docid", "conv_id", "turn_idx")
        .collect()
    }
    assert after == before


def test_update_skips_and_never_resurrects_deleted(spark, upd_index):
    d, rows = upd_index
    n_del = delete_by_query(spark, d, "w9", cfg=TEST_CFG)
    deleted = {r.docid for r in rows if "w9" in set(tokenize_text(r.text))}
    assert n_del == len(deleted) > 0
    res = update_by_query(spark, d, {"tool": "'seen'"}, query=UPD_Q, cfg=TEST_CFG)
    # matched set counts live docs only
    want = {
        r.docid
        for r in rows
        if UPD_Q in set(tokenize_text(r.text)) and r.docid not in deleted
    }
    assert res["docs_updated"] == len(want)
    # deleted docs stay invisible even in rebuilt buckets (physically
    # dropped there; still masked elsewhere)
    hits = bm25_topk(spark, d, "w9", k=len(rows), cfg=TEST_CFG, mode="simple").collect()
    assert not ({r.docid for r in hits} & deleted)


def test_rejects_identity_and_unknown_columns(spark, upd_index):
    d, _rows = upd_index
    with pytest.raises(ValueError):
        update_by_query(spark, d, {"conv_id": "'x'"}, query=UPD_Q, cfg=TEST_CFG)
    with pytest.raises(ValueError):
        update_by_query(spark, d, {"nope": "'x'"}, query=UPD_Q, cfg=TEST_CFG)
    with pytest.raises(ValueError):
        update_by_query(spark, d, {"tool": "'x'"}, cfg=TEST_CFG)  # no selector
