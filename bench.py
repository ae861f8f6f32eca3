#!/usr/bin/env python
"""Headline benchmark for the driver: one JSON line on stdout.

Runs the engine's flagship paths at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` (default 32):

- ``index_build``     full posting-block index build over documents
- ``bm25_idx_q1/q2``  top-k via the index with block-max pruning
- ``bm25_direct``     index-free declarative BM25
- ``q1_pricing``      TPC-H Q1 shaped agg over lineitem
- ``region_revenue``  4-way broadcast join + agg
- ``doc_minhash``     MinHash-LSH near-dup pairs over documents
- ``emb_topk``        brute-force cosine top-k over embeddings

Prints exactly one JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
   "sf": ..., "build_turns_per_sec": ...}``
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def _sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(path)))
    try:
        return float(m.group(1)) if m else 0.0
    except ValueError:
        return 0.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.operators import dedup, similarity
    from mysql_es_spark.operators.query import bm25_topk, direct_bm25, phrase_topk
    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.session import get_spark

    spark = get_spark("bench", cores=cpus)

    def t(name):
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    docs = t("documents")
    n_docs = docs.count()  # warm the JVM + parquet footer cache

    # positional layout: measured cost-neutral vs positionless at this
    # scale (BENCH.md §3) and lets the suite exercise the phrase path
    cfg = IndexConfig(
        n_buckets=4, wave_size=4, salt_docs=1 << 20, term_buckets=8, with_positions=True
    )
    transcripts = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
    )

    timings: dict[str, float] = {}

    def run(name: str, fn, reps: int = 2) -> None:
        # best-of-N: this sandbox's shared host swings ±2× between
        # identical reps; the min approximates the steady-state floor
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        timings[name] = best

    # Untimed warm-up: spawn the Python/Arrow worker pool and JIT the
    # codegen paths once, so timed numbers are steady-state (same protocol
    # as scripts/bench_scaling.py, which discards a warm-up build leg).
    warm_ix = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        build_index(spark, transcripts.limit(256), warm_ix, cfg)
        bm25_topk(spark, warm_ix, "spark", k=5, cfg=cfg, mode="pruned").collect()
        dedup.minhash_lsh_pairs(docs.limit(256), n=2, num_perm=64, bands=16).collect()
    finally:
        shutil.rmtree(warm_ix, ignore_errors=True)

    ix = tempfile.mkdtemp(prefix="bench_ix_")
    try:

        def full_build():
            shutil.rmtree(ix, ignore_errors=True)
            build_index(spark, transcripts, ix, cfg)

        run("index_build", full_build)
        build_tps = n_docs / timings["index_build"]

        q1, q2 = "spark join query", "window agg batch scan"
        run("bm25_idx_q1", lambda: bm25_topk(spark, ix, q1, k=20, cfg=cfg, mode="pruned").collect())
        run("bm25_idx_q2", lambda: bm25_topk(spark, ix, q2, k=20, cfg=cfg, mode="pruned").collect())
        # informational only (NOT counted into the headline total, which
        # stays comparable round-over-round): the round-4 df-routed auto
        # mode on the same two queries — rank-identical by test
        extra: dict[str, float] = {}
        for name, q in (("bm25_idx_q1_auto", q1), ("bm25_idx_q2_auto", q2)):
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                bm25_topk(spark, ix, q, k=20, cfg=cfg, mode="auto").collect()
                best = min(best, time.monotonic() - t0)
            extra[name] = round(best, 3)
        run("bm25_direct", lambda: direct_bm25(docs, q1, k=20).collect())
        run(
            "phrase_idx",
            lambda: phrase_topk(spark, ix, "row scan", k=20, cfg=cfg).collect(),
        )

        li = t("lineitem")
        run(
            "q1_pricing",
            lambda: (
                li.filter(F.col("l_shipdate") <= "1998-09-02")
                .groupBy("l_returnflag", "l_linestatus")
                .agg(
                    F.sum("l_quantity").alias("sum_qty"),
                    F.sum("l_extendedprice").alias("sum_base_price"),
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                        "sum_disc_price"
                    ),
                    F.avg("l_quantity").alias("avg_qty"),
                    F.count(F.lit(1)).alias("count_order"),
                )
                .collect()
            ),
        )

        o, c = t("orders"), t("customer")
        n, r = t("nation"), t("region")
        run(
            "region_revenue",
            lambda: (
                o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
                .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
                .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
                .groupBy("r_name")
                .agg(F.sum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
                .collect()
            ),
        )

        run(
            "doc_minhash",
            lambda: dedup.minhash_lsh_pairs(
                docs, n=2, num_perm=64, bands=16, threshold=0.15
            ).collect(),
        )

        emb = t("embeddings")
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
        run("emb_topk", lambda: similarity.cosine_topk(emb, qv, k=10).collect())
    finally:
        shutil.rmtree(ix, ignore_errors=True)

    total = sum(timings.values())
    print(
        json.dumps(
            {
                "metric": "headline_suite_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "queries_extra": extra,
                "sf": _sf_of(sf_dir),
                "build_turns_per_sec": round(build_tps, 1),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
