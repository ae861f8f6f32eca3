#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (BASELINE.json).

The rule requires the same job at two cluster sizes (N and 4N executors)
with throughput scaling efficiency >= 0.8. This sandbox has no cluster, so
— per the driver's instruction — we run the identical index-build job on
the identical pre-generated input at two local parallelism levels
(default ``local[8]`` vs ``local[32]``), each in a **fresh JVM**
(subprocess), and report throughput at both plus

    efficiency = (tput_hi / tput_lo) / (cores_hi / cores_lo)

Usage:
    python scripts/bench_scaling.py [--turns 400000] [--cores 8,32]
                                    [--json-out /tmp/scaling.json]

Prints a human-readable summary plus one JSON line; paste the numbers into
BENCH.md / BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# mid-frequency Zipf vocabulary terms: present in the corpus but not
# stop-word-dense, so the pruned query path has real work to do.
QUERIES = ["w120 w450 w900", "w37 w2000 w5001", "w10 w999", "w3000 w4500 w8000 w250"]


def run_one(corpus_dir: str, cores: int) -> dict:
    """Child-process entry: fresh JVM, build + query, JSON on last line."""
    from pyspark.sql import functions as F  # noqa: F401

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.operators.query import bm25_topk
    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.session import get_spark

    spark = get_spark(f"scaling-{cores}", cores=cores)
    df = spark.read.parquet(os.path.join(corpus_dir, "transcripts"))
    n_turns = df.count()  # warm-up: JVM, parquet footers
    cfg = IndexConfig(n_buckets=64, wave_size=64, salt_docs=1 << 16, term_buckets=32)

    ix = tempfile.mkdtemp(prefix=f"scaling_ix_{cores}_")
    try:
        t0 = time.monotonic()
        build_index(spark, df, ix, cfg)
        build_s = time.monotonic() - t0

        # query latency: mean over the reference-style query set, post-warm
        bm25_topk(spark, ix, QUERIES[0], k=10, cfg=cfg, mode="pruned").collect()
        lat = []
        for q in QUERIES:
            t0 = time.monotonic()
            bm25_topk(spark, ix, q, k=10, cfg=cfg, mode="pruned").collect()
            lat.append(time.monotonic() - t0)
    finally:
        shutil.rmtree(ix, ignore_errors=True)
    spark.stop()
    return {
        "cores": cores,
        "turns": n_turns,
        "build_sec": round(build_s, 2),
        "turns_per_sec": round(n_turns / build_s, 1),
        "query_mean_sec": round(sum(lat) / len(lat), 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=400_000)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--json-out", default="")
    ap.add_argument("--run-one", nargs=2, metavar=("CORPUS", "CORES"), help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.run_one:
        res = run_one(args.run_one[0], int(args.run_one[1]))
        print("RESULT " + json.dumps(res))
        return 0

    lo, hi = (int(c) for c in args.cores.split(","))
    corpus = tempfile.mkdtemp(prefix="scaling_corpus_")
    try:
        # generate the shared input once (untimed)
        from mysql_es_spark.corpus import write_corpus
        from mysql_es_spark.session import get_spark

        spark = get_spark("scaling-gen", cores=hi)
        meta = write_corpus(spark, corpus, args.turns)
        spark.stop()
        print(f"corpus: {meta}", file=sys.stderr)

        results = {}
        for cores in (lo, hi):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run-one", corpus, str(cores)],
                capture_output=True, text=True, cwd=REPO, timeout=3600,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
            if not line:
                print(p.stdout, file=sys.stderr)
                print(p.stderr[-4000:], file=sys.stderr)
                raise RuntimeError(f"run at cores={cores} failed")
            results[cores] = json.loads(line[-1][len("RESULT "):])
            print(f"cores={cores}: {results[cores]}", file=sys.stderr)
    finally:
        shutil.rmtree(corpus, ignore_errors=True)

    tlo, thi = results[lo]["turns_per_sec"], results[hi]["turns_per_sec"]
    eff = (thi / tlo) / (hi / lo)
    out = {
        "turns": results[lo]["turns"],
        "low": results[lo],
        "high": results[hi],
        "scaling_efficiency": round(eff, 3),
        "meets_north_rule": eff >= 0.8,
    }
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
