"""Volume stress for the session-3 operators: EQL, ES|QL, transforms,
downsample, sequence dedup at ~10^6 events on local[32].

Prints one JSON line with wall seconds per operator — the §7 BENCH
numbers at gate scale are job-count-bound; this run shows the same
plans at three orders of magnitude more rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--users", type=int, default=20_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mysql_es_spark.functions.esql import esql
    from mysql_es_spark.operators.dedup import dedup_sequences
    from mysql_es_spark.operators.eql import sequence_matches
    from mysql_es_spark.plans.downsample import downsample
    from mysql_es_spark.plans.transform import (
        TransformConfig,
        run_transform,
        tick_transform,
    )
    from mysql_es_spark.session import get_spark

    spark = get_spark(
        "stress_session3", cores=args.cores,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    # deterministic synthetic event log: id-derived type/user/ts/value
    n, u = args.events, args.users
    src = tempfile.mkdtemp(prefix="s3_events_")
    (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=(F.pmod(F.xxhash64("id"), 90 * 86400)).cast("double"))
            ).alias("ts"),
            F.pmod(F.xxhash64("id", F.lit(1)), u).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(x) for x in ("view", "click", "purchase", "error", "signup")]),
                (F.pmod(F.xxhash64("id", F.lit(2)), 5) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(3)), 10_000) / 100.0).alias("value"),
        )
        .write.mode("overwrite")
        .parquet(src)
    )
    ev = spark.read.parquet(src)
    ev.count()  # warm

    out: dict = {"events": n, "users": u, "cores": args.cores}

    t0 = time.monotonic()
    m = sequence_matches(
        ev, "user_id",
        ["event_type = 'view'", "event_type = 'click'", "event_type = 'purchase'"],
        tiebreak="event_id", maxspan_seconds=14 * 86400,
        until="event_type = 'error'",
    ).count()
    out["eql_sequence_sec"] = round(time.monotonic() - t0, 2)
    out["eql_matches"] = int(m)

    t0 = time.monotonic()
    r = esql(
        'FROM e | WHERE event_type != "error" '
        "| STATS n = COUNT(*), total = SUM(value), mx = MAX(value) BY user_id "
        "| SORT total DESC | LIMIT 25",
        {"e": ev},
    ).collect()
    out["esql_stats_sec"] = round(time.monotonic() - t0, 2)
    assert len(r) == 25

    cfg = TransformConfig(
        mode="pivot", group_by=("user_id",),
        aggs={"n": "count(*)", "total": "sum(value)", "last_ts": "max(ts)"},
        sync_field="ts", n_parts=64,
    )
    dest = tempfile.mkdtemp(prefix="s3_tf_")
    t0 = time.monotonic()
    run_transform(spark, ev, dest, cfg)
    out["transform_full_sec"] = round(time.monotonic() - t0, 2)

    # a trickle of late events for 50 users → tick touches ≤50 buckets
    late = (
        spark.range(50)
        .select(
            (F.col("id") + n).alias("event_id"),
            F.lit("2024-12-01 00:00:00").cast("timestamp").alias("ts"),
            F.col("id").alias("user_id"),
            F.lit("purchase").alias("event_type"),
            F.lit(1.0).alias("value"),
        )
    )
    late.write.mode("append").parquet(src)
    ev2 = spark.read.parquet(src)
    t0 = time.monotonic()
    info = tick_transform(spark, ev2, dest, cfg)
    out["transform_tick_sec"] = round(time.monotonic() - t0, 2)
    out["tick_changed_keys"] = info["changed_keys"]
    out["tick_parts_rewritten"] = info["parts_rewritten"]

    ds = tempfile.mkdtemp(prefix="s3_ds_")
    t0 = time.monotonic()
    info = downsample(spark, ev2, ds, "1 day", ["event_type"], ["value"])
    out["downsample_sec"] = round(time.monotonic() - t0, 2)
    out["downsample_rows_out"] = info["rows_out"]

    t0 = time.monotonic()
    kept = dedup_sequences(ev2, "user_id", ["ts", "event_id"], "event_type").count()
    out["sequence_dedup_sec"] = round(time.monotonic() - t0, 2)
    out["unique_histories"] = int(kept)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
