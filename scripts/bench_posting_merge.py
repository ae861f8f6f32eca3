#!/usr/bin/env python
"""Posting-merge fast path vs wave rebuild at a small CDC change rate.

Round-2 verdict item #8's "done" criterion: tick time at ~1% change rate
must drop measurably vs the bucket/wave rebuild, with rank identity
preserved. This script builds one index, copies it, applies the SAME
update-only batch through both paths, times them, and proves the two
result indexes are fingerprint-identical.

Usage: python scripts/bench_posting_merge.py [--turns 1250000]
       [--cores 32] [--change-pct 1.0]
Prints one JSON line; numbers land in BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1_250_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--change-pct", type=float, default=1.0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.corpus import transcripts_df_dist
    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.session import get_spark
    from mysql_es_spark.streaming.incremental import incremental_update

    spark = get_spark(
        "bench_pmerge", cores=args.cores,
        extra={"spark.ui.showConsoleProgress": "false", "spark.rdd.compress": "true"},
    )
    root = tempfile.mkdtemp(prefix="pmerge_")
    out: dict = {"turns": args.turns, "cores": args.cores, "change_pct": args.change_pct}

    src = os.path.join(root, "transcripts")
    transcripts_df_dist(spark, args.turns, seed=31, n_slices=args.cores * 2).write.mode(
        "overwrite"
    ).parquet(src)
    df = spark.read.parquet(src)
    out["turns_actual"] = df.count()

    cfg = IndexConfig(
        n_buckets=64, wave_size=64, salt_docs=1 << 14, term_buckets=32,
        with_positions=True,
    )
    ix = os.path.join(root, "ix")
    t0 = time.monotonic()
    build_index(spark, df, ix, cfg)
    out["build_sec"] = round(time.monotonic() - t0, 1)

    # update-only batch: rewrite the text of ~change_pct% of conversations
    # (drop all old terms, add fresh ones — the worst case for the merge,
    # since every old term's posting group must be rewritten)
    frac = args.change_pct / 100.0
    convs = (
        df.select("conv_id").distinct()
        .filter(F.pmod(F.xxhash64("conv_id"), F.lit(10_000)) < int(frac * 10_000))
    )
    changed = convs.cache()
    n_convs = changed.count()
    upd = df.join(changed, "conv_id", "left_semi").withColumn(
        "text",
        F.concat_ws(
            " ", F.lit("updz updz"),
            F.concat(F.lit("u"), F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(997)).cast("string")),
        ),
    )
    v2 = df.join(changed, "conv_id", "left_anti").unionByName(upd)
    v2.write.mode("overwrite").parquet(os.path.join(root, "v2"))
    v2 = spark.read.parquet(os.path.join(root, "v2"))
    out["changed_convs"] = n_convs

    ix_m = os.path.join(root, "ix_merge")
    shutil.copytree(ix, ix_m)

    # wave rebuild path (merge="never") on the original dir
    t0 = time.monotonic()
    r1 = incremental_update(spark, v2, changed, ix, cfg, merge="never")
    out["rebuild_sec"] = round(time.monotonic() - t0, 1)
    out["rebuild_waves"] = len(r1["waves_rebuilt"])

    # posting-merge path on the copy (raise the cap: this batch is the point)
    t0 = time.monotonic()
    r2 = incremental_update(
        spark, v2, changed, ix_m, cfg, merge="auto", merge_max_docs=10_000_000
    )
    out["merge_sec"] = round(time.monotonic() - t0, 1)
    out["merge_mode"] = r2.get("mode", "rebuild!")
    out["merge_docs"] = r2.get("docs_updated", -1)

    # identity: both paths must produce the same logical index
    fps = {}
    for tag, d in (("rebuild", ix), ("merge", ix_m)):
        fp = {}
        for table, cols in [
            ("forward", ["docid", "doc_key", "text"]),
            ("doc_lens", ["docid", "dl"]),
            ("term_dict", ["term", "df", "ttf"]),
        ]:
            t = spark.read.parquet(os.path.join(d, table)).select(*cols)
            row = t.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.pmod(F.xxhash64(*cols), F.lit(2**31))).alias("h"),
            ).collect()[0]
            fp[table] = (int(row["n"]), int(row["h"]))
        fps[tag] = fp
    out["identical"] = fps["rebuild"] == fps["merge"]
    out["speedup"] = round(out["rebuild_sec"] / max(out["merge_sec"], 1e-9), 2)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    return 0 if out["identical"] and out["merge_mode"] == "posting_merge" else 1


if __name__ == "__main__":
    sys.exit(main())
