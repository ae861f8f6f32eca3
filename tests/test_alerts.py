"""Continuous percolation (ES Watcher analog): delta stream → alerts."""

from __future__ import annotations

import os

from mysql_es_spark import corpus
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.streaming.alerts import percolate_batch, start_alert_stream

QUERIES = [
    ("watch_all", "w0 w3", "all"),
    ("watch_any", "w7 w11", "any"),
]


def _oracle_hits(rows):
    want = set()
    for r in rows:
        toks = set(tokenize_text(r.text))
        if {"w0", "w3"} <= toks:
            want.add((f"{r.conv_id}:{r.turn_idx}", "watch_all"))
        if toks & {"w7", "w11"}:
            want.add((f"{r.conv_id}:{r.turn_idx}", "watch_any"))
    return want


def test_alert_stream_end_to_end(spark, tmp_path):
    delta = str(tmp_path / "delta")
    alerts = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(delta)

    b1 = corpus.transcripts_df(spark, 300, seed=51)
    b1.write.mode("append").parquet(delta)
    q = start_alert_stream(spark, delta, QUERIES, alerts, ckpt)
    q.awaitTermination()

    got = {
        (r.doc_key, r.query_id)
        for r in spark.read.parquet(alerts).collect()
    }
    want = _oracle_hits(b1.collect())
    assert got == want and want

    # a second delta drains into NEW alert rows only (checkpoint advances)
    b2 = corpus.transcripts_df(spark, 200, seed=52)
    b2.write.mode("append").parquet(delta)
    q = start_alert_stream(spark, delta, QUERIES, alerts, ckpt)
    q.awaitTermination()
    rows = spark.read.parquet(alerts).collect()
    got2 = {(r.doc_key, r.query_id) for r in rows}
    assert got2 == want | _oracle_hits(b2.collect())
    # batch ids recorded per epoch (natural dedup key downstream)
    assert {r.batch_id for r in rows} == {0, 1}


def test_percolate_batch_direct(spark):
    df = corpus.transcripts_df(spark, 150, seed=53)
    got = {
        (r.doc_key, r.query_id)
        for r in percolate_batch(spark, df, QUERIES, batch_id=7).collect()
    }
    assert got == _oracle_hits(df.collect())
