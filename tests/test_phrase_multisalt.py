"""Phrase queries on a multi-salt, multi-wave positional index, and
positional preservation through the incremental (CDC) path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import phrase_topk
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.streaming.incremental import incremental_update
from tests.conftest import TEST_CFG

POS_CFG = TEST_CFG.with_(with_positions=True)  # salt_docs=256, 4 buckets


def _py_phrase_docs(rows, phrase):
    ph = tokenize_text(phrase)
    out = {}
    for r in rows:
        toks = tokenize_text(r["text"])
        n = sum(
            1 for i in range(len(toks) - len(ph) + 1) if toks[i : i + len(ph)] == ph
        )
        if n:
            out[r["docid"]] = n
    return out


@pytest.fixture(scope="module")
def pos_ix(spark, tiny_transcripts, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("posms") / "ix")
    build_index(spark, tiny_transcripts, d, POS_CFG)
    return d


def test_multisalt_phrase_matches_reference(spark, pos_ix):
    # the 1200-turn fixture spans several salts (salt_docs=256) and 2 waves
    n_salts = (
        spark.read.parquet(f"{pos_ix}/postings")
        .select("salt")
        .distinct()
        .count()
    )
    assert n_salts >= 3
    fwd = spark.read.parquet(f"{pos_ix}/forward").select("docid", "text").collect()
    for q in ["w0 w1", "w1 w0 w2", "w3 w5"]:
        got = {
            r.docid: r.n_hits
            for r in phrase_topk(spark, pos_ix, q, k=10**6, cfg=POS_CFG).collect()
        }
        assert got == _py_phrase_docs(fwd, q), q


@pytest.mark.parametrize("merge", ["never", "auto"])
def test_incremental_update_preserves_positions(spark, tiny_transcripts, tmp_path, merge):
    d = str(tmp_path / f"ix_{merge}")
    build_index(spark, tiny_transcripts, d, POS_CFG)
    # change one conversation's text; rebuild only its bucket
    changed = tiny_transcripts.limit(1).select("conv_id")
    cid = changed.collect()[0]["conv_id"]
    v2 = tiny_transcripts.withColumn(
        "text",
        F.when(
            F.col("conv_id") == cid, F.lit("zzmarker alpha zzmarker beta")
        ).otherwise(F.col("text")),
    )
    m = incremental_update(spark, v2, changed, d, POS_CFG, merge=merge)
    # update-only batch: merge="auto" must take the posting-merge fast
    # path; merge="never" the wave rebuild — positions survive both
    if merge == "auto":
        assert m["mode"] == "posting_merge"
    else:
        assert m["waves_rebuilt"]
    fwd = spark.read.parquet(f"{d}/forward").select("docid", "text").collect()
    got = {
        r.docid: r.n_hits
        for r in phrase_topk(spark, d, "zzmarker alpha", k=10**6, cfg=POS_CFG).collect()
    }
    assert got == _py_phrase_docs(fwd, "zzmarker alpha")
    assert len(got) > 0  # the updated turns are findable by phrase
