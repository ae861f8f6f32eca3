#!/usr/bin/env python
"""Round-2 feature stress at volume: 1M-turn index → msearch batch →
bulk soft delete → masked-query latency → purge-on-compact.

Measures what the small-SF gate can't: mask overhead with a real deletes
table, msearch per-query amortization at scale, and purge throughput.

Usage: python scripts/stress_deletes.py [--turns 1200000] [--cores 32]
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
    ap.add_argument("--turns", type=int, default=1_200_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.corpus import transcripts_df
    from mysql_es_spark.operators.query import bm25_topk, bm25_topk_multi
    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.plans.compact import compact_index
    from mysql_es_spark.plans.deletes import delete_by_query
    from mysql_es_spark.session import get_spark

    spark = get_spark("stress_deletes", cores=args.cores)
    ix = os.path.join(TMP, "stress_del_ix")
    ix2 = os.path.join(TMP, "stress_del_ix2")
    shutil.rmtree(ix, ignore_errors=True)
    shutil.rmtree(ix2, ignore_errors=True)
    cfg = IndexConfig(n_buckets=32, wave_size=32, salt_docs=1 << 14, term_buckets=32)

    df = transcripts_df(spark, args.turns, seed=11)
    df.count()  # warm workers

    out: dict = {"requested_turns": args.turns, "cores": args.cores}
    t0 = time.monotonic()
    build_index(spark, df, ix, cfg)
    out["build_sec"] = round(time.monotonic() - t0, 2)
    n_docs = spark.read.parquet(f"{ix}/corpus_stats").collect()[0]["n_docs"]
    out["docs"] = int(n_docs)
    out["build_turns_per_sec"] = round(n_docs / out["build_sec"], 1)

    q = "w1 w17 w83"
    for name, when in (("query_before_delete_sec", 1), ("", 0)):
        if when:
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                bm25_topk(spark, ix, q, k=10, cfg=cfg, mode="pruned").collect()
                best = min(best, time.monotonic() - t0)
            out[name] = round(best, 3)

    # msearch: 100-query batch vs the single-query latency above
    batch = {f"q{i}": f"w{3 * i + 1} w{5 * i + 2}" for i in range(100)}
    t0 = time.monotonic()
    n_rows = bm25_topk_multi(spark, ix, batch, k=10, cfg=cfg).count()
    out["msearch_100q_sec"] = round(time.monotonic() - t0, 2)
    out["msearch_rows"] = int(n_rows)
    out["msearch_sec_per_query"] = round(out["msearch_100q_sec"] / 100, 4)

    # bulk soft delete (~every doc containing a mid-frequency term)
    t0 = time.monotonic()
    n_del = delete_by_query(spark, ix, "w13", cfg=cfg)
    out["delete_sec"] = round(time.monotonic() - t0, 2)
    out["docs_deleted"] = int(n_del)

    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        bm25_topk(spark, ix, q, k=10, cfg=cfg, mode="pruned").collect()
        best = min(best, time.monotonic() - t0)
    out["query_after_delete_sec"] = round(best, 3)

    t0 = time.monotonic()
    stats = compact_index(spark, ix, ix2)
    out["purge_compact_sec"] = round(time.monotonic() - t0, 2)
    out["docs_purged"] = stats["docs_purged"]
    out["docs_after_purge"] = stats["n_docs"]
    assert stats["docs_purged"] == n_del
    assert stats["n_docs"] == n_docs - n_del

    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        bm25_topk(spark, ix2, q, k=10, cfg=cfg, mode="pruned").collect()
        best = min(best, time.monotonic() - t0)
    out["query_after_purge_sec"] = round(best, 3)

    shutil.rmtree(ix, ignore_errors=True)
    shutil.rmtree(ix2, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
