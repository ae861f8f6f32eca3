"""ES transforms: pivot/latest, incremental ticks == full recompute,
changed-bucket-only rewrites, config drift refusal."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.plans.transform import (
    TransformConfig,
    read_transform,
    run_transform,
    tick_transform,
)

T0 = datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + timedelta(seconds=s), u, v) for i, (s, u, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, value double",
    )


PIVOT = TransformConfig(
    mode="pivot",
    group_by=("user_id",),
    aggs={"n": "count(*)", "total": "sum(value)", "last_ts": "max(ts)"},
    sync_field="ts",
    n_parts=8,
)


def _snap(dest):
    out = {}
    root = os.path.join(dest, "table")
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, root)] = os.path.getmtime(p)
    return out


def test_pivot_batch_matches_groupby(spark, tmp_path):
    src = _events(spark, [(i, i % 5, float(i)) for i in range(50)])
    dest = str(tmp_path / "t1")
    info = run_transform(spark, src, dest, PIVOT)
    assert info["mode"] == "full" and info["watermark"] is not None
    got = {(r.user_id, r.n, r.total) for r in read_transform(spark, dest).collect()}
    want = {
        (r.user_id, r.n, r.total)
        for r in src.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_tick_equals_full_recompute_and_touches_only_changed_parts(spark, tmp_path):
    base = [(i, i % 40, float(i)) for i in range(200)]
    src1 = _events(spark, base)
    dest = str(tmp_path / "t2")
    run_transform(spark, src1, dest, PIVOT)
    before = _snap(dest)

    # append: 2 existing users updated + 1 brand-new user, later sync ts
    extra = [(1000 + j, [3, 7, 99][j], 100.0 + j) for j in range(3)]
    src2 = _events(spark, base + extra)
    info = tick_transform(spark, src2, dest, PIVOT)
    assert info["mode"] == "incremental" and info["changed_keys"] == 3
    assert info["parts_rewritten"] <= 3  # ≤ one partition per changed key

    got = sorted(
        (r.user_id, r.n, round(r.total, 6))
        for r in read_transform(spark, dest).collect()
    )
    want = sorted(
        (r.user_id, r.n, round(r.total, 6))
        for r in src2.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    )
    assert got == want

    # unaffected partitions: byte-identical files, untouched mtimes
    after = _snap(dest)
    changed_parts = {f.split("/")[0] for f in set(after) - set(before)} | {
        f.split("/")[0]
        for f in before
        if f in after and after[f] != before[f]
    }
    touched = {p for p in changed_parts if p.startswith("part=")}
    assert len(touched) <= info["parts_rewritten"]
    untouched_files = [
        f for f in before if f.split("/")[0].startswith("part=") and f.split("/")[0] not in touched
    ]
    assert untouched_files, "test must leave some partition untouched"
    for f in untouched_files:
        assert after[f] == before[f]


def test_tick_is_noop_without_new_data_and_idempotent(spark, tmp_path):
    src = _events(spark, [(i, i % 5, float(i)) for i in range(30)])
    dest = str(tmp_path / "t3")
    run_transform(spark, src, dest, PIVOT)
    assert tick_transform(spark, src, dest, PIVOT)["mode"] == "noop"
    # replaying a tick (crash before meta commit): same input → same table
    src2 = _events(spark, [(i, i % 5, float(i)) for i in range(40)])
    tick_transform(spark, src2, dest, PIVOT)
    first = sorted(map(tuple, read_transform(spark, dest).collect()))
    # meta didn't advance? simulate by forcing a second tick with same src
    tick_transform(spark, src2, dest, PIVOT)
    assert sorted(map(tuple, read_transform(spark, dest).collect())) == first


def test_delay_catches_late_rows_at_watermark(spark, tmp_path):
    """ES transform checkpoint `delay`: a row arriving AFTER a tick but
    carrying sync == watermark is missed under strict `>` (delay=0) and
    caught with a look-back delay; re-detection stays idempotent."""
    cfg = PIVOT.__class__(**{**PIVOT.__dict__, "delay_seconds": 5.0})
    early = [(i, i % 5, float(i)) for i in range(20)]
    src = _events(spark, early)
    dest = str(tmp_path / "t_delay")
    run_transform(spark, src, dest, cfg)
    # a late arrival stamped exactly AT the watermark (s == 19 == max)
    late = early + [(19, 2, 1000.0)]
    src2 = _events(spark, late)
    info = tick_transform(spark, src2, dest, cfg)
    assert info["mode"] == "incremental" and info["changed_keys"] >= 1
    got = {(r.user_id, r.n, r.total) for r in read_transform(spark, dest).collect()}
    want = {
        (r.user_id, r.n, r.total)
        for r in src2.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want
    # replay with no new data: the overlap window re-detects keys but
    # recomputation is idempotent — table unchanged
    tick_transform(spark, src2, dest, cfg)
    assert {(r.user_id, r.n, r.total) for r in read_transform(spark, dest).collect()} == want
    # control: delay=0 misses the same late row (documented gap)
    dest0 = str(tmp_path / "t_delay0")
    run_transform(spark, src, dest0, PIVOT)
    assert tick_transform(spark, src2, dest0, PIVOT)["mode"] == "noop"


def test_latest_transform(spark, tmp_path):
    cfg = TransformConfig(
        mode="latest",
        unique_key=("user_id",),
        sort_field="ts",
        tiebreak="event_id",
        sync_field="ts",
        n_parts=4,
    )
    base = [(i, i % 7, float(i)) for i in range(70)]
    src1 = _events(spark, base)
    dest = str(tmp_path / "t4")
    run_transform(spark, src1, dest, cfg)
    extra = [(500, 2, 999.0), (501, 2, 998.0)]  # two updates for user 2
    src2 = _events(spark, base + extra)
    tick_transform(spark, src2, dest, cfg)
    got = {(r.user_id, r.event_id) for r in read_transform(spark, dest).collect()}
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {
        (r.user_id, r.event_id)
        for r in src2.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == want
    assert (2, 71) in got  # the later of the two updates wins


def test_config_drift_refused(spark, tmp_path):
    src = _events(spark, [(i, i % 3, float(i)) for i in range(9)])
    dest = str(tmp_path / "t5")
    run_transform(spark, src, dest, PIVOT)
    drifted = TransformConfig(
        mode="pivot",
        group_by=("user_id",),
        aggs={"n": "count(*)"},
        sync_field="ts",
        n_parts=8,
    )
    with pytest.raises(ValueError, match="config"):
        tick_transform(spark, src, dest, drifted)
    with pytest.raises(ValueError, match="config|layout"):
        run_transform(spark, src, dest, drifted)


def test_latest_requires_tiebreak(spark):
    with pytest.raises(ValueError, match="tiebreak"):
        TransformConfig(
            mode="latest", unique_key=("u",), sort_field="ts", sync_field="ts"
        ).validate()


def test_continuous_transform_stream(spark, tmp_path):
    from mysql_es_spark.streaming.transform_stream import start_transform_stream

    src = str(tmp_path / "src")
    dest = str(tmp_path / "tdest")
    ckpt = str(tmp_path / "ckpt")
    base = [(i, i % 6, float(i)) for i in range(60)]
    _events(spark, base).write.mode("overwrite").parquet(src)

    run_transform(spark, spark.read.parquet(src), dest, PIVOT)

    # new files arrive (later sync ts); the stream drains and ticks
    extra = _events(spark, base + [(500 + j, j % 6, 50.0 + j) for j in range(4)])
    extra.filter("event_id >= 60").write.mode("append").parquet(src)
    q = start_transform_stream(spark, src, dest, PIVOT, ckpt)
    q.awaitTermination(120)

    got = sorted(
        (r.user_id, r.n, round(r.total, 6))
        for r in read_transform(spark, dest).collect()
    )
    want = sorted(
        (r.user_id, r.n, round(r.total, 6))
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    )
    assert got == want

    # nothing new: drain again, tick is a no-op, table unchanged
    q2 = start_transform_stream(spark, src, dest, PIVOT, ckpt)
    q2.awaitTermination(120)
    assert sorted(map(tuple, read_transform(spark, dest).collect())) == sorted(
        map(tuple, read_transform(spark, dest).collect())
    )
    got2 = sorted(
        (r.user_id, r.n, round(r.total, 6))
        for r in read_transform(spark, dest).collect()
    )
    assert got2 == want
