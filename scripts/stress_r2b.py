#!/usr/bin/env python
"""Volume stress for the continuation features: multi-field multi_match,
percolate, dup_spans, epoch_mix, and hybrid RRF at a few-hundred-k-turn
corpus (32 cores). Prints one JSON line of timings + sanity counts.

Usage: python scripts/stress_r2b.py [--turns 300000] [--cores 32]
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

TMP = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=300_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.corpus import transcripts_df
    from mysql_es_spark.operators.dedup import dup_spans
    from mysql_es_spark.operators.percolate import percolate
    from mysql_es_spark.operators.sampling import epoch_mix
    from mysql_es_spark.plans.multi_field import build_multi_field, multi_match_topk
    from mysql_es_spark.session import get_spark

    spark = get_spark("stress_r2b", cores=args.cores)
    cfg = IndexConfig(n_buckets=32, wave_size=32, salt_docs=1 << 14, term_buckets=32)
    df = transcripts_df(spark, args.turns, seed=99).cache()
    n = df.count()
    out: dict = {"turns": int(n), "cores": args.cores}

    def timed(name, fn):
        t0 = time.monotonic()
        r = fn()
        out[name] = round(time.monotonic() - t0, 2)
        return r

    mf = os.path.join(TMP, "stress_r2b_mf")
    shutil.rmtree(mf, ignore_errors=True)
    timed("build_mf_2fields_sec", lambda: build_multi_field(
        spark, df, mf, {"text": 1.0, "tool": 2.0}, cfg))

    out["mm_best_hits"] = len(timed("multi_match_best_sec", lambda: multi_match_topk(
        spark, mf, "w1 bash w17", k=10, mtype="best_fields", tie_breaker=0.3).collect()))
    out["mm_cross_hits"] = len(timed("multi_match_cross_sec", lambda: multi_match_topk(
        spark, mf, "w1 bash w17", k=10, mtype="cross_fields").collect()))

    stored = [(f"q{i}", f"w{3 * i} w{5 * i + 2}", "all" if i % 2 else "any")
              for i in range(50)]
    docs = df.selectExpr("xxhash64(conv_id, turn_idx) AS doc_id", "text")
    out["percolate_matches"] = timed(
        "percolate_50q_sec", lambda: percolate(spark, docs, stored).count())

    out["dup_span_rows"] = timed(
        "dup_spans_n8_sec", lambda: dup_spans(docs, n=8, min_count=2).count())

    out["epoch_mix_rows"] = timed("epoch_mix_sec", lambda: epoch_mix(
        df.selectExpr("xxhash64(conv_id, turn_idx) AS doc_id", "role"),
        "role", {"user": 2.0, "assistant": 1.0, "tool": 3.5}, id_col="doc_id").count())

    shutil.rmtree(mf, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
