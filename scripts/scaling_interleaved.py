#!/usr/bin/env python
"""Interleaved scaling-leg A/B — the protocol the round-4 bench dispute
settled on, applied to the north rule's 2→8-core legs.

Round 4 measured raw 0.796 (vs 0.894 at round 3) on an UNCHANGED build
path and attributed the dip to host drift; the bench regression taught
us attribution isn't proof. This script removes the time-of-day
confound the sequential harness (bench_scaling.py) cannot: the legs run
ALTERNATED in one session — hw-ceiling probe, then lo, hi, hi, lo
(ABBA), … , closing hw probe — so every lo rep has a hi rep a few
minutes away on either side. Each leg is still a fresh JVM pinned with
taskset to exactly its core count, same pinned physical plan
(shuffle.partitions fixed), same pre-generated corpus on tmpfs.

Reported per-pair efficiency = (tput_hi / tput_lo) / (cores_hi /
cores_lo) using the reps adjacent in time, plus the aggregate
(best-of-reps, the steady-state floor both legs get equal shots at) and
the flanking hw ceilings for normalization.

Usage:
    python scripts/scaling_interleaved.py [--turns 7305000] [--cores 2,8]
        [--reps 2] [--shuffle-partitions 64] [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts.bench_scaling import _mkdtemp, hw_check  # noqa: E402


def run_leg(corpus: str, cores: int, shuffle_partitions: int) -> dict:
    """One fresh-JVM pinned leg via bench_scaling's --run-one child
    (1 timed rep per invocation; the interleaving supplies the reps)."""
    env = dict(os.environ, SPARK_GRAFT_SCALING_REPS="1")
    p = subprocess.run(
        [
            "taskset", "-c", ",".join(str(i) for i in range(cores)),
            sys.executable, os.path.join(REPO, "scripts", "bench_scaling.py"),
            "--run-one", corpus, str(cores), str(shuffle_partitions),
        ],
        capture_output=True, text=True, cwd=REPO, timeout=3600, env=env,
    )
    line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
    if not line:
        print(p.stdout, file=sys.stderr)
        print(p.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"leg at cores={cores} failed")
    return json.loads(line[-1][len("RESULT "):])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=7_305_000)
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()
    lo, hi = (int(c) for c in args.cores.split(","))

    corpus = _mkdtemp("scaling_ab_corpus_")
    out: dict = {"protocol": "interleaved", "order": [], "legs": {str(lo): [], str(hi): []}}
    try:
        from mysql_es_spark.corpus import write_corpus
        from mysql_es_spark.session import get_spark

        spark = get_spark("scaling-ab-gen", cores=8)
        meta = write_corpus(spark, corpus, args.turns)
        spark.stop()
        print(f"corpus: {meta}", file=sys.stderr)
        out["turns_requested"] = args.turns

        out["hw_open"] = hw_check(spans=(lo, hi))
        print(f"hw open: {out['hw_open']}", file=sys.stderr)

        # ABBA order: lo hi | hi lo | lo hi | ... — every pair of
        # adjacent same-kind reps brackets the other kind
        order: list[int] = []
        for r in range(args.reps):
            order += [lo, hi] if r % 2 == 0 else [hi, lo]
        for i, cores in enumerate(order):
            t0 = time.time()
            res = run_leg(corpus, cores, args.shuffle_partitions)
            res["wall_at"] = round(t0, 1)
            out["legs"][str(cores)].append(res)
            out["order"].append(cores)
            print(f"[{i+1}/{len(order)}] cores={cores}: {res}", file=sys.stderr)

        out["hw_close"] = hw_check(spans=(lo, hi))
        print(f"hw close: {out['hw_close']}", file=sys.stderr)
    finally:
        shutil.rmtree(corpus, ignore_errors=True)

    ratio = hi / lo
    tlo = [r["turns_per_sec"] for r in out["legs"][str(lo)]]
    thi = [r["turns_per_sec"] for r in out["legs"][str(hi)]]
    # time-adjacent pairs (rep i of each kind)
    out["pair_efficiency"] = [
        round((h / l) / ratio, 3) for l, h in zip(tlo, thi)
    ]
    out["best_of_efficiency"] = round((max(thi) / max(tlo)) / ratio, 3)
    out["mean_efficiency"] = round(
        ((sum(thi) / len(thi)) / (sum(tlo) / len(tlo))) / ratio, 3
    )
    hw_eff = []
    for k in ("hw_open", "hw_close"):
        h = out[k]
        if lo in h and hi in h:
            hw_eff.append((h[hi] / h[lo]) / ratio)
        elif str(lo) in h and str(hi) in h:
            hw_eff.append((h[str(hi)] / h[str(lo)]) / ratio)
    out["hw_ceiling_efficiency"] = round(sum(hw_eff) / len(hw_eff), 3) if hw_eff else None
    if out["hw_ceiling_efficiency"]:
        out["normalized_best_of"] = round(
            out["best_of_efficiency"] / out["hw_ceiling_efficiency"], 3
        )
    out["meets_north_rule"] = (
        out["best_of_efficiency"] >= 0.8
        or (out.get("normalized_best_of") or 0) >= 0.8
    )
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
