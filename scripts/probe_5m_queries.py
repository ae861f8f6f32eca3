#!/usr/bin/env python
"""Query-latency probe at the largest local corpus (~3.5M turns by
default): does top-k latency stay flat as the corpus grows?

Builds a positional index on tmpfs, then measures (best-of-2, post-warm)
pruned BM25, conjunctive, phrase, and a 100-query msearch batch.

Usage: python scripts/probe_5m_queries.py [--turns 5000000] [--cores 32]
Prints one JSON line.
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

TMP = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=5_000_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.corpus import transcripts_df
    from mysql_es_spark.operators.query import (
        bm25_topk,
        bm25_topk_conjunctive,
        bm25_topk_multi,
        phrase_topk,
    )
    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.session import get_spark

    spark = get_spark("probe5m", cores=args.cores)
    ix = os.path.join(TMP, "probe5m_ix")
    shutil.rmtree(ix, ignore_errors=True)
    cfg = IndexConfig(
        n_buckets=32, wave_size=32, salt_docs=1 << 14, term_buckets=32,
        with_positions=True,
    )
    df = transcripts_df(spark, args.turns, seed=5)
    df.count()  # warm

    out: dict = {"cores": args.cores}
    t0 = time.monotonic()
    build_index(spark, df, ix, cfg)
    out["build_sec"] = round(time.monotonic() - t0, 1)
    n = spark.read.parquet(f"{ix}/corpus_stats").collect()[0]["n_docs"]
    out["docs"] = int(n)
    out["build_turns_per_sec"] = round(n / out["build_sec"], 1)

    def best2(fn):
        b = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            fn()
            b = min(b, time.monotonic() - t0)
        return round(b, 3)

    out["bm25_pruned_sec"] = best2(
        lambda: bm25_topk(spark, ix, "w1 w17 w83", k=10, cfg=cfg, mode="pruned").collect()
    )
    out["bm25_head_terms_sec"] = best2(
        lambda: bm25_topk(spark, ix, "w0 w1", k=10, cfg=cfg, mode="pruned").collect()
    )
    out["conjunctive_sec"] = best2(
        lambda: bm25_topk_conjunctive(spark, ix, "w1 w17 w83", k=10, cfg=cfg).collect()
    )
    out["phrase_sec"] = best2(
        lambda: phrase_topk(spark, ix, "w0 w1", k=10, cfg=cfg).collect()
    )
    batch = {f"q{i}": f"w{3 * i + 1} w{5 * i + 2}" for i in range(100)}
    t0 = time.monotonic()
    bm25_topk_multi(spark, ix, batch, k=10, cfg=cfg).count()
    out["msearch_100q_sec"] = round(time.monotonic() - t0, 2)

    shutil.rmtree(ix, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
