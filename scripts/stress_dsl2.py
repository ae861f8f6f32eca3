#!/usr/bin/env python
"""Volume stress for the query-DSL continuation: constant_score, pinned,
match_bool_prefix, span_first, span_not, terms_set, min_score,
simple_query_string, ids, completion suggester, and the curation +
dedup-on-ingest pipelines at a few-hundred-k-turn corpus (32 cores).
Prints one JSON line of timings + sanity counts.

Usage: python scripts/stress_dsl2.py [--turns 600000] [--cores 32]
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
    ap.add_argument("--turns", type=int, default=600_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.corpus import transcripts_df
    from mysql_es_spark.operators.query import (
        constant_score_topk,
        exists_topk,
        ids_topk,
        match_bool_prefix_topk,
        bm25_topk,
        pinned_topk,
        simple_query_string_topk,
        span_first_topk,
        span_not_topk,
        suggest_completion,
        terms_set_topk,
    )
    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.session import get_spark
    from mysql_es_spark.streaming.dedup_ingest import dedup_batch

    spark = get_spark("stress_dsl2", cores=args.cores)
    cfg = IndexConfig(
        n_buckets=32, wave_size=32, salt_docs=1 << 14, term_buckets=32,
        with_positions=True,
    )
    df = transcripts_df(spark, args.turns, seed=123).cache()
    n = df.count()
    out: dict = {"turns": int(n), "cores": args.cores}

    def timed(name, fn):
        t0 = time.monotonic()
        r = fn()
        out[name] = round(time.monotonic() - t0, 2)
        return r

    ix = os.path.join(TMP, "stress_dsl2_ix")
    shutil.rmtree(ix, ignore_errors=True)
    timed("build_sec", lambda: build_index(spark, df, ix, cfg))

    out["constant_hits"] = len(timed("constant_score_sec", lambda: constant_score_topk(
        spark, ix, "w1 w7 w23", k=100, cfg=cfg).collect()))
    out["pinned_hits"] = len(timed("pinned_sec", lambda: pinned_topk(
        spark, ix, "w1 w7", ["c00000004:0", "c00000002:1"], k=20, cfg=cfg).collect()))
    out["mbp_hits"] = len(timed("match_bool_prefix_sec", lambda: match_bool_prefix_topk(
        spark, ix, "w1 w2", k=20, cfg=cfg).collect()))
    out["span_first_hits"] = len(timed("span_first_sec", lambda: span_first_topk(
        spark, ix, "w3", end=2, k=20, cfg=cfg).collect()))
    out["span_not_hits"] = len(timed("span_not_sec", lambda: span_not_topk(
        spark, ix, "w3", "w1", pre=1, post=1, k=20, cfg=cfg).collect()))
    out["terms_set_hits"] = len(timed("terms_set_sec", lambda: terms_set_topk(
        spark, ix, ["w1", "w7", "w23", "w40"], msm_expr="1 + pmod(turn_idx, 3)",
        k=20, cfg=cfg).collect()))
    out["min_score_hits"] = len(timed("min_score_sec", lambda: bm25_topk(
        spark, ix, "w1 w7 w23", k=1000, cfg=cfg, mode="pruned",
        min_score=0.5).collect()))
    out["sqs_hits"] = len(timed("simple_query_string_sec", lambda: simple_query_string_topk(
        spark, ix, "w1 + (w7 | w23) -w1000", k=20, cfg=cfg).collect()))
    out["ids_hits"] = len(timed("ids_sec", lambda: ids_topk(
        spark, ix, ["c00000004:0", "c00000002:1", "missing:0"], cfg=cfg).collect()))
    out["exists_hits"] = len(timed("exists_sec", lambda: exists_topk(
        spark, ix, "tool", k=50, cfg=cfg).collect()))
    out["completion_hits"] = len(timed("completion_sec", lambda: suggest_completion(
        spark, ix, "w1", size=10).collect()))

    # curation + dedup-on-ingest over the documents shape
    from mysql_es_spark.operators.curation import curate
    from pyspark.sql import functions as F

    docs = df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("role").alias("lang"),
        "text",
    ).cache()
    docs.count()
    out["curate_rows"] = timed(
        "curate_sec", lambda: curate(docs, langs=("user", "assistant"), train_pct=80).count()
    )
    ingest = os.path.join(TMP, "stress_dsl2_ingest")
    shutil.rmtree(ingest, ignore_errors=True)
    half = int(n) // 2
    r0 = timed("ingest_epoch0_sec", lambda: dedup_batch(
        spark, df.limit(half), 0, ingest))
    out["ingest_epoch0_accepted"] = r0["n_accepted"]
    r1 = timed("ingest_epoch1_sec", lambda: dedup_batch(spark, df, 1, ingest))
    out["ingest_epoch1_accepted"] = r1["n_accepted"]

    shutil.rmtree(ix, ignore_errors=True)
    shutil.rmtree(ingest, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
