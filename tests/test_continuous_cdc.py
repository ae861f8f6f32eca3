"""Continuous-trigger CDC (round 4, VERDICT r3 item 6): a long-running
``trigger(processingTime=...)`` stream dispatching each micro-batch into
the incremental path — the Spark shape of the reference's 200 ms canal
flush loop (Emiter.java:109) — with the checkpoint + crash-marker resume
path carrying across a mid-stream kill."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from mysql_es_spark import corpus
from mysql_es_spark.operators.query import bm25_topk
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.streaming.incremental import start_cdc_stream
from tests.conftest import TEST_CFG
from tests.test_incremental import _fingerprints


def _wait(pred, timeout=90.0, step=0.4):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        try:
            if pred():
                return True
        except Exception:
            pass  # index mid-rewrite: retry
        time.sleep(step)
    return False


def test_continuous_cdc_three_batches_and_kill(spark, tmp_path):
    """≥3 live micro-batches under processingTime trigger, fingerprint
    identity to a fresh build after each, then a mid-stream kill: a delta
    arriving while the stream is DOWN is replayed from the checkpoint on
    restart and the index converges again."""
    v0 = corpus.transcripts_df(spark, 400, seed=23).cache()
    ix = str(tmp_path / "ix")
    delta_dir = str(tmp_path / "deltas")
    ckpt = str(tmp_path / "ckpt")
    build_index(spark, v0, ix, TEST_CFG)

    # four successive states, each stamping one conv with a unique term
    states, convs = [v0], ["c00000002", "c00000005", "c00000008", "c00000011"]
    for i, cv in enumerate(convs, start=1):
        prev = states[-1]
        states.append(
            prev.withColumn(
                "text",
                F.when(
                    F.col("conv_id") == cv,
                    F.concat(F.col("text"), F.lit(f" livebatch{i}sentinel")),
                ).otherwise(F.col("text")),
            ).cache()
        )

    current = {"df": v0}
    import os

    os.makedirs(delta_dir, exist_ok=True)
    q = start_cdc_stream(
        spark, delta_dir, lambda: current["df"], ix, ckpt, TEST_CFG,
        processing_time="500 milliseconds",
    )
    assert q.isActive

    def sentinel_visible(i, cv):
        hits = bm25_topk(
            spark, ix, f"livebatch{i}sentinel", k=50, cfg=TEST_CFG, with_keys=True
        ).collect()
        return bool(hits) and {r.conv_id for r in hits} == {cv}

    try:
        # three LIVE micro-batches through the running stream
        for i in (1, 2, 3):
            current["df"] = states[i]
            states[i].filter(F.col("conv_id") == convs[i - 1]).write.mode(
                "append"
            ).parquet(delta_dir)
            assert _wait(lambda: sentinel_visible(i, convs[i - 1])), f"batch {i}"
            fresh = str(tmp_path / f"fresh{i}")
            build_index(spark, states[i], fresh, TEST_CFG)
            assert _fingerprints(spark, ix) == _fingerprints(spark, fresh), i
        n_batches = len(q.recentProgress)
        assert n_batches >= 3
    finally:
        q.stop()

    # mid-stream kill: a delta lands while the stream is down...
    current["df"] = states[4]
    states[4].filter(F.col("conv_id") == convs[3]).write.mode("append").parquet(
        delta_dir
    )
    # ...restart from the SAME checkpoint; the unseen file is replayed
    q2 = start_cdc_stream(
        spark, delta_dir, lambda: current["df"], ix, ckpt, TEST_CFG,
        processing_time="500 milliseconds",
    )
    try:
        assert _wait(lambda: sentinel_visible(4, convs[3])), "post-restart batch"
        fresh = str(tmp_path / "fresh4")
        build_index(spark, states[4], fresh, TEST_CFG)
        assert _fingerprints(spark, ix) == _fingerprints(spark, fresh)
    finally:
        q2.stop()


def test_continuous_cdc_heals_inflight_marker(spark, tmp_path):
    """A _MERGE_INFLIGHT marker left by a crashed posting merge must force
    the healing wave rebuild on the next continuous-trigger batch (ST2)."""
    from mysql_es_spark.streaming.posting_merge import MARKER

    v0 = corpus.transcripts_df(spark, 300, seed=29).cache()
    ix = str(tmp_path / "ix")
    delta_dir = str(tmp_path / "deltas")
    ckpt = str(tmp_path / "ckpt")
    build_index(spark, v0, ix, TEST_CFG)
    v1 = v0.withColumn(
        "text",
        F.when(
            F.col("conv_id") == "c00000003",
            F.concat(F.col("text"), F.lit(" healsentinel")),
        ).otherwise(F.col("text")),
    ).cache()

    # simulate a crash mid-merge: marker for bucket 0 left behind
    import json
    import os

    mp = os.path.join(ix, MARKER)
    with open(mp, "w") as f:
        json.dump({"buckets": [0], "batch_id": 99}, f)

    current = {"df": v1}
    os.makedirs(delta_dir, exist_ok=True)
    q = start_cdc_stream(
        spark, delta_dir, lambda: current["df"], ix, ckpt, TEST_CFG,
        processing_time="500 milliseconds",
    )
    try:
        v1.filter(F.col("conv_id") == "c00000003").write.mode("append").parquet(
            delta_dir
        )

        def healed():
            hits = bm25_topk(
                spark, ix, "healsentinel", k=50, cfg=TEST_CFG, with_keys=True
            ).collect()
            return (
                bool(hits)
                and {r.conv_id for r in hits} == {"c00000003"}
                and not os.path.exists(mp)
            )

        assert _wait(healed)
        fresh = str(tmp_path / "fresh")
        build_index(spark, v1, fresh, TEST_CFG)
        assert _fingerprints(spark, ix) == _fingerprints(spark, fresh)
    finally:
        q.stop()
