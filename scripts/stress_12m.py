#!/usr/bin/env python
"""10x scale proof (round-2 verdict item #1): ~12M-turn corpus through the
full pipeline — distributed corpus generation, index build (positional),
pruned BM25 + phrase + conjunctive + msearch, MinHash-LSH near-dup pairs at
turn granularity, SemDeDup over 1M synthetic embeddings, and a transform
full run + incremental tick.

The prior largest run was 5M turns (BENCH.md §6); the scaling-efficiency
bench runs at 0.6-1.25M. This script shows every headline operator
completing at ~10x the scaling-bench corpus with ~linear wall-time growth.

Usage: python scripts/stress_12m.py [--turns 12000000] [--cores 32]
Prints one JSON line; numbers land in BENCH.md §8.
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

TMPBASE = "/dev/shm" if os.path.isdir("/dev/shm") else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=12_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--keep-corpus", default="", help="write corpus here and keep it")
    ap.add_argument("--skip", default="", help="comma list: build,queries,minhash,semdedup,transform")
    ap.add_argument("--reuse-index", action="store_true",
                    help="skip the build when the index dir is already complete")
    ap.add_argument(
        "--local-dirs", default="/tmp/spark_local_12m",
        help="comma list of scratch dirs (Spark round-robins blocks across "
        "them — the standard multi-disk-node setup). The 12M minhash job "
        "keeps ~85G of live shuffle across its stages, more than this "
        "host's ~90G disk alone; adding a BOUNDED tmpfs dir pools both "
        "devices (tmpfs pages count against RAM — keep JVM heap low).",
    )
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.corpus import transcripts_df_dist
    from mysql_es_spark.operators.dedup import minhash_lsh_pairs, semantic_dedup
    from mysql_es_spark.operators.query import (
        bm25_topk,
        bm25_topk_conjunctive,
        bm25_topk_multi,
        phrase_topk,
    )
    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.plans.transform import TransformConfig, run_transform, tick_transform
    from mysql_es_spark.session import get_spark

    # Shuffle/spill MUST go to real disk: tmpfs pages count against RAM, and
    # a 12M-turn positional build writes tens of GB of shuffle+cache spill —
    # on /dev/shm that OOM-kills the JVM (observed: 77G tmpfs + 42G heap).
    # The corpus itself (a few GB, read-mostly) can stay in tmpfs.
    extra = {
        "spark.ui.showConsoleProgress": "false",
        "spark.local.dir": args.local_dirs,
        # cached-block spill compression (lz4): the persisted tokenized
        # stream is the largest single spill in the build
        "spark.rdd.compress": "true",
        # reclaim each wave's shuffle files promptly — the default 30 min
        # periodic GC lets 8 waves of spill accumulate on a ~90G disk
        "spark.cleaner.periodicGC.interval": "1min",
    }
    spark = get_spark("stress12m", cores=args.cores, extra=extra)
    out: dict = {"cores": args.cores}

    def mark(k, v):
        # partial results must survive a crash in a later phase
        out[k] = v
        print(f"PHASE {k}={v}", file=sys.stderr, flush=True)

    corpus = args.keep_corpus or tempfile.mkdtemp(prefix="stress12m_", dir=TMPBASE)
    src = os.path.join(corpus, "transcripts")
    t0 = time.monotonic()
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        transcripts_df_dist(spark, args.turns, seed=12, n_slices=args.cores * 2).write.mode(
            "overwrite"
        ).parquet(src)
    mark("gen_sec", round(time.monotonic() - t0, 1))
    df = spark.read.parquet(src)
    mark("turns", df.count())

    # --- index build (positional layout, §6 config) ---
    ix = os.path.join(corpus, "ix")
    skip_build = "build" in skip or (
        args.reuse_index and os.path.isdir(os.path.join(ix, "corpus_stats"))
    )
    if not skip_build:
        shutil.rmtree(ix, ignore_errors=True)
    # wave_size 16 (8 waves): waves exist precisely to bound a single
    # job's blast radius AND its scratch footprint — one 12M-turn wave
    # spills >75G of shuffle+cache on this host (ENOSPC); 1.5M-turn waves
    # peak ~10G each and the cleaner reclaims between waves
    cfg = IndexConfig(
        n_buckets=128, wave_size=16, salt_docs=1 << 14, term_buckets=32,
        with_positions=True,
    )
    if not skip_build:
        t0 = time.monotonic()
        build_index(spark, df, ix, cfg)
        mark("build_sec", round(time.monotonic() - t0, 1))
        mark("build_turns_per_sec", round(out["turns"] / out["build_sec"], 1))

    def best2(fn):
        b = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            fn()
            b = min(b, time.monotonic() - t0)
        return round(b, 3)

    if "queries" not in skip:
        mark("bm25_pruned_sec", best2(
            lambda: bm25_topk(spark, ix, "w120 w450 w900", k=10, cfg=cfg, mode="pruned").collect()
        ))
        mark("bm25_head_terms_sec", best2(
            lambda: bm25_topk(spark, ix, "w0 w1", k=10, cfg=cfg, mode="pruned").collect()
        ))
        # round-4 auto mode (df-routed simple-vs-pruned; rank-identical)
        mark("bm25_auto_sec", best2(
            lambda: bm25_topk(spark, ix, "w120 w450 w900", k=10, cfg=cfg, mode="auto").collect()
        ))
        mark("bm25_head_auto_sec", best2(
            lambda: bm25_topk(spark, ix, "w0 w1", k=10, cfg=cfg, mode="auto").collect()
        ))
        mark("conjunctive_sec", best2(
            lambda: bm25_topk_conjunctive(spark, ix, "w1 w17 w83", k=10, cfg=cfg).collect()
        ))
        mark("phrase_sec", best2(
            lambda: phrase_topk(spark, ix, "w0 w1", k=10, cfg=cfg).collect()
        ))
        batch = {f"q{i}": f"w{3 * i + 1} w{5 * i + 2}" for i in range(100)}
        t0 = time.monotonic()
        bm25_topk_multi(spark, ix, batch, k=10, cfg=cfg).count()
        mark("msearch_100q_sec", round(time.monotonic() - t0, 2))

    # --- MinHash-LSH near-dup pairs at turn granularity (~12M docs) ---
    if "minhash" not in skip:
        base_docs = df.filter(F.length("text") > 0).select(
            F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
        )
        # plant near-dups so the run proves recall, not just completion:
        # ~0.2% exact copies (collapse path) + ~0.2% one-token-appended
        # mutations (banded-LSH + exact-verify path)
        exact_cp = base_docs.sample(0.002, seed=3).select(
            F.xxhash64("doc_id").alias("doc_id"), "text"
        )
        near_cp = base_docs.sample(0.002, seed=4).select(
            F.xxhash64("doc_id", F.lit(1)).alias("doc_id"),
            F.concat_ws(" ", "text", F.lit("w7 w8")).alias("text"),
        )
        docs = base_docs.unionByName(exact_cp).unionByName(near_cp)
        # short Zipf-vocab turns form massive identical-shingle-set
        # clusters: at the default band-bucket cap (4096) a single hot
        # bucket emits 8.4M candidate pairs and the candidate set at 12M
        # docs exceeds 100G of shuffle (observed). This corpus IS the
        # boilerplate-heavy shard the fan-out guards were designed for —
        # cap the buckets tightly and take the degrade-to-cluster path
        # for the rest (minhash_megaclusters), exactly as a web-scale
        # curation run would.
        t0 = time.monotonic()
        n_pairs = minhash_lsh_pairs(
            docs, n=3, num_perm=64, bands=16, threshold=0.5, max_band_bucket=64
        ).count()
        mark("minhash_lsh_sec", round(time.monotonic() - t0, 1))
        mark("minhash_pairs", int(n_pairs))
        from mysql_es_spark.operators.dedup import minhash_megaclusters

        t0 = time.monotonic()
        n_mega = minhash_megaclusters(
            docs, n=3, num_perm=64, bands=16, max_band_bucket=64
        ).count()
        mark("minhash_megacluster_sec", round(time.monotonic() - t0, 1))
        mark("minhash_megaclusters", int(n_mega))

    # --- SemDeDup over 1M synthetic embeddings (64-dim) ---
    if "semdedup" not in skip:
        def gen_vecs(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                # deterministic per-row vectors; ~1% planted near-dup pairs
                rng = np.random.default_rng(int(ids[0]) + 7)
                v = rng.standard_normal((len(ids), 64)).astype(np.float32)
                dup = ids % 100 == 1
                v[dup] = v[np.maximum(ids - 1, 0) % len(ids)][dup] + 0.01
                yield pd.DataFrame({"vec_id": ids, "embedding": list(v)})

        emb_path = os.path.join(corpus, "emb")
        (
            spark.range(1_000_000)
            .repartition(args.cores * 2)
            .mapInPandas(gen_vecs, schema="vec_id long, embedding array<float>")
            .write.mode("overwrite")
            .parquet(emb_path)
        )
        emb = spark.read.parquet(emb_path)
        emb.count()
        t0 = time.monotonic()
        sd = semantic_dedup(emb, threshold=0.95, n_cells=256)
        n_drop = sd.filter(~F.col("keep")).count()
        mark("semdedup_sec", round(time.monotonic() - t0, 1))
        mark("semdedup_dropped", int(n_drop))

    # --- transform: full run + incremental tick on a late trickle ---
    if "transform" not in skip:
        tcfg = TransformConfig(
            mode="pivot", group_by=("conv_id",),
            aggs={"n_turns": "count(*)", "last_ts": "max(ts)"},
            sync_field="ts", n_parts=128,
        )
        dest = os.path.join(corpus, "tf")
        t0 = time.monotonic()
        run_transform(spark, df, dest, tcfg)
        mark("transform_full_sec", round(time.monotonic() - t0, 1))

        late = df.limit(200).select(
            "conv_id", (F.col("turn_idx") + 1000).alias("turn_idx"), "role",
            "text", "tool", F.lit("2027-01-01 00:00:00").cast("timestamp").alias("ts"),
        )
        late.write.mode("append").parquet(src)
        df2 = spark.read.parquet(src)
        t0 = time.monotonic()
        info = tick_transform(spark, df2, dest, tcfg)
        mark("transform_tick_sec", round(time.monotonic() - t0, 1))
        mark("tick_changed_keys", info["changed_keys"])

    if not args.keep_corpus:
        shutil.rmtree(corpus, ignore_errors=True)
    for d in extra["spark.local.dir"].split(","):
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
