"""Streaming dedup-on-ingest: in-batch first-wins, cross-batch content
memory, replay idempotence, and the availableNow stream wrapper."""

from __future__ import annotations

from datetime import datetime

import pytest

from mysql_es_spark.streaming.dedup_ingest import dedup_batch, start_dedup_ingest

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)
TS = datetime(2026, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [(c, t, "user", x, None, TS) for c, t, x in rows], schema=SCHEMA
    )


def _accepted(spark, out):
    try:
        return {
            (r.conv_id, r.turn_idx)
            for r in spark.read.parquet(f"{out}/accepted").collect()
        }
    except Exception:
        return set()


def test_dedup_batch_in_and_cross_batch(spark, tmp_path):
    out = str(tmp_path / "ingest")
    b0 = _df(
        spark,
        [
            ("a", 0, "hello world"),
            ("a", 1, "fresh content one"),
            ("b", 0, "Hello,   WORLD!"),  # same normalized content as a:0
        ],
    )
    r0 = dedup_batch(spark, b0, 0, out)
    assert r0 == {"batch": 0, "n_in": 3, "n_accepted": 2}
    assert _accepted(spark, out) == {("a", 0), ("a", 1)}  # first-wins by key

    b1 = _df(
        spark,
        [
            ("c", 0, "hello world"),  # seen in batch 0 → dropped
            ("c", 1, "brand new text"),
        ],
    )
    r1 = dedup_batch(spark, b1, 1, out)
    assert r1 == {"batch": 1, "n_in": 2, "n_accepted": 1}
    assert _accepted(spark, out) == {("a", 0), ("a", 1), ("c", 1)}


def test_dedup_batch_replay_idempotent(spark, tmp_path):
    out = str(tmp_path / "ingest")
    b0 = _df(spark, [("a", 0, "alpha beta"), ("a", 1, "gamma delta")])
    dedup_batch(spark, b0, 0, out)
    b1 = _df(spark, [("b", 0, "alpha beta"), ("b", 1, "epsilon")])
    r_first = dedup_batch(spark, b1, 1, out)
    # crash-replay of the SAME epoch: must not double-accept or be blocked
    # by its own earlier fingerprints
    r_again = dedup_batch(spark, b1, 1, out)
    assert r_first == r_again == {"batch": 1, "n_in": 2, "n_accepted": 1}
    assert _accepted(spark, out) == {("a", 0), ("a", 1), ("b", 1)}


def test_dedup_ingest_stream(spark, tmp_path):
    delta = tmp_path / "delta"
    delta.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _df(spark, [("a", 0, "one two"), ("a", 1, "three four")]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(delta / "f1"))
    _df(spark, [("b", 0, "ONE  two!"), ("b", 1, "five six")]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(delta / "f2"))
    q = start_dedup_ingest(
        spark, f"{delta}/*", out, ck, max_files_per_trigger=1
    )
    q.awaitTermination()
    acc = _accepted(spark, out)
    # exactly one of the two "one two" variants survives, plus the uniques
    assert ("a", 1) in acc and ("b", 1) in acc
    assert (("a", 0) in acc) ^ (("b", 0) in acc)
    assert len(acc) == 3
    # resume with the same checkpoint: no new data → nothing changes
    q2 = start_dedup_ingest(spark, f"{delta}/*", out, ck, max_files_per_trigger=1)
    q2.awaitTermination()
    assert _accepted(spark, out) == acc
