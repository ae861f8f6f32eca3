#!/usr/bin/env python
"""Auto-mode routing evidence on a SKEWED corpus (VERDICT r4 item 6).

BENCH.md §8a's 12M-doc auto-mode table lives on the uniform synthetic
corpus, where block-max bounds prune nothing by construction
(pruned_salts = 0) and full decode always wins. This script runs the
same single-query protocol on `corpus.bursty_pdf`'s tf/dl-skewed corpus
(≥2M docs), where per-salt upper bounds genuinely spread, and records
for each query shape × mode (simple / pruned / auto):

  - best-of-N warm latency,
  - the auto profile (auto_sum_df, auto_threshold — CALIBRATED from the
    build-time decode probe — and auto_chose),
  - the pruned profile's decoded/pruned salt counts (pruned_salts > 0
    is the point of this corpus),

plus a second auto pass at a tight latency budget (an SLA-style
auto_latency_budget_sec) to show the calibrated threshold routing the
head query to the pruned path when the full decode would bust the
budget.

Usage:
    python scripts/bench_auto_skew.py [--docs 2400000] [--cores 32]
        [--reps 2] [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TMPBASE = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"

QUERIES = {
    "head_bigram": "w0 w1",
    "upper_mid_bigram": "w40 w80",
    "mid_3term": "w120 w450 w900",
    "tail_3term": "w3000 w4500 w8000",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_400_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tight-budget", type=float, default=0.25)
    ap.add_argument("--salt-docs", type=int, default=1 << 12)
    ap.add_argument("--json-out", default="")
    ap.add_argument("--keep-index", default="")
    args = ap.parse_args()

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.corpus import bursty_df_dist
    from mysql_es_spark.operators.query import auto_threshold, bm25_topk, effective_config
    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.session import get_spark

    spark = get_spark(
        "auto-skew", cores=args.cores,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    cfg = IndexConfig(n_buckets=32, wave_size=8, salt_docs=args.salt_docs, term_buckets=16)
    ix = args.keep_index or os.path.join(TMPBASE, "auto_skew_ix")
    out: dict = {"docs_requested": args.docs, "cfg": {
        "n_buckets": cfg.n_buckets, "salt_docs": cfg.salt_docs}}

    if not os.path.exists(os.path.join(ix, "corpus_stats")):
        shutil.rmtree(ix, ignore_errors=True)
        df = bursty_df_dist(spark, args.docs, seed=9, n_slices=64)
        t0 = time.monotonic()
        build_index(spark, df, ix, cfg)
        out["build_sec"] = round(time.monotonic() - t0, 1)
    meta = spark.read.parquet(os.path.join(ix, "index_meta")).collect()[0]
    out["decode_rows_per_sec"] = meta["decode_rows_per_sec"]
    out["n_docs"] = int(
        spark.read.parquet(os.path.join(ix, "corpus_stats")).collect()[0]["n_docs"]
    )
    ecfg = effective_config(spark, ix, cfg)
    out["auto_threshold_default"] = auto_threshold(ix, ecfg)

    def timed(q: str, mode: str, use_cfg) -> tuple[float, dict]:
        best, prof_best = None, {}
        for _ in range(args.reps):
            prof: dict = {}
            t0 = time.monotonic()
            bm25_topk(spark, ix, q, k=10, cfg=use_cfg, mode=mode, profile=prof).collect()
            dt = time.monotonic() - t0
            if best is None or dt < best:
                best, prof_best = dt, prof
        return round(best, 3), prof_best

    tight = cfg.with_(auto_latency_budget_sec=args.tight_budget)
    results = {}
    for name, q in QUERIES.items():
        # warm
        bm25_topk(spark, ix, q, k=10, cfg=cfg, mode="simple").collect()
        row: dict = {}
        for mode in ("simple", "pruned", "auto"):
            dt, prof = timed(q, mode, cfg)
            row[mode] = dt
            if mode == "pruned":
                # pruned_salts lives on the phase2-decode entry; n_salts
                # is the total per-salt ranges considered
                row["n_salts"] = prof.get("n_salts")
                for ph in prof.get("phases", []):
                    if "pruned_salts" in ph:
                        row["pruned_salts"] = ph["pruned_salts"]
                        row["phase2_salts"] = ph["salts"]
                row["tau"] = prof.get("tau")
            if mode == "auto":
                row["auto_sum_df"] = prof.get("auto_sum_df")
                row["auto_threshold"] = prof.get("auto_threshold")
                row["auto_chose"] = prof.get("auto_chose")
        dt, prof = timed(q, "auto", tight)
        row["auto_tight"] = dt
        row["auto_tight_threshold"] = prof.get("auto_threshold")
        row["auto_tight_chose"] = prof.get("auto_chose")
        results[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    out["queries"] = results
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
