#!/usr/bin/env python
"""Volume stress for the aggregation + intervals wave: every new agg
(matrix_stats, t_test, rate, value_count, MAD, boxplot, string_stats,
sampler, percentiles_bucket, normalize, cumulative_cardinality,
auto_date_histogram, scripted_metric, moving_percentiles), the intervals
query, rank_feature, and quality-aware dedup winner selection at a
few-hundred-k-turn corpus. Prints one JSON line of timings + sanity
counts — the point is that every one of these stays sub-linear-ish and
driver-light at volume, not micro-benchmark precision.

Usage: python scripts/stress_aggs.py [--turns 400000] [--cores 32]
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
    ap.add_argument("--turns", type=int, default=400_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.corpus import transcripts_df
    from mysql_es_spark.operators import aggs, dedup
    from mysql_es_spark.operators.query import intervals_topk, rank_feature_topk
    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.session import get_spark

    spark = get_spark("stress_aggs", cores=args.cores)
    cfg = IndexConfig(n_buckets=8, wave_size=4, salt_docs=4096, with_positions=True)
    root = tempfile.mkdtemp(prefix="stress_aggs_", dir=TMP)
    ix = os.path.join(root, "ix")
    out: dict = {"turns": args.turns, "cores": args.cores, "timings": {}, "counts": {}}

    def step(name, fn):
        t0 = time.monotonic()
        r = fn()
        out["timings"][name] = round(time.monotonic() - t0, 2)
        return r

    try:
        df = transcripts_df(spark, args.turns, seed=99).cache()
        df.count()
        step("index_build", lambda: build_index(spark, df, ix, cfg))
        Q = "w0 w3"

        out["counts"]["matrix_stats_n"] = step(
            "matrix_stats", lambda: aggs.matrix_stats_agg(spark, ix, Q, cfg=cfg).collect()
        )[0].n
        out["counts"]["t_test_na"] = step(
            "t_test", lambda: aggs.t_test_agg(spark, ix, Q, "w1 w5", cfg=cfg).collect()
        )[0].n_a
        out["counts"]["rate_buckets"] = len(
            step("rate", lambda: aggs.rate_agg(spark, ix, Q, "hour", "minute", cfg=cfg).collect())
        )
        out["counts"]["value_count"] = step(
            "value_count", lambda: aggs.value_count(spark, ix, Q, "tool", cfg=cfg).collect()
        )[0].n_values
        step("mad", lambda: aggs.median_absolute_deviation(spark, ix, Q, cfg=cfg).collect())
        step("boxplot", lambda: aggs.boxplot_agg(spark, ix, Q, cfg=cfg).collect())
        out["counts"]["string_stats_n"] = step(
            "string_stats", lambda: aggs.string_stats(spark, ix, Q, cfg=cfg).collect()
        )[0].n_values
        step("sampler", lambda: aggs.sampler_agg(spark, ix, Q, shard_size=100, cfg=cfg).collect())
        step(
            "percentiles_bucket",
            lambda: aggs.percentiles_bucket_agg(spark, ix, Q, "hour", cfg=cfg).collect(),
        )
        step(
            "normalize_softmax",
            lambda: aggs.normalize_agg(spark, ix, Q, "hour", "softmax", cfg=cfg).collect(),
        )
        out["counts"]["cum_card_final"] = step(
            "cumulative_cardinality",
            lambda: aggs.cumulative_cardinality_agg(spark, ix, Q, "tool", "hour", cfg=cfg).collect(),
        )[-1].cum_unique
        out["counts"]["auto_interval"] = step(
            "auto_date_histogram",
            lambda: aggs.auto_date_histogram(spark, ix, Q, 48, cfg=cfg).collect(),
        )[0].interval
        step(
            "scripted_metric",
            lambda: aggs.scripted_metric_agg(
                spark, ix, Q, "length(text) / dl", "avg", cfg=cfg
            ).collect(),
        )
        step(
            "moving_percentiles",
            lambda: aggs.moving_percentiles_agg(spark, ix, Q, "hour", cfg=cfg).collect(),
        )
        rule = {
            "any_of": {
                "intervals": [
                    {"match": {"query": "w0 w3", "max_gaps": 2, "ordered": True}},
                    {"match": {"query": "w1 w4", "max_gaps": 0}},
                ]
            }
        }
        out["counts"]["intervals_rows"] = len(
            step("intervals", lambda: intervals_topk(spark, ix, rule, k=20, cfg=cfg).collect())
        )
        out["counts"]["rank_feature_rows"] = len(
            step(
                "rank_feature",
                lambda: rank_feature_topk(
                    spark, ix, Q, pivot=100.0, k=20, cfg=cfg
                ).collect(),
            )
        )
        from pyspark.sql import functions as F

        docs = (
            df.limit(20000)
            .select(
                F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
                F.col("text"),
            )
            .where(F.col("text").isNotNull())
        )
        # synthetic turns share template bigrams heavily — cap shingle df
        # (the operator's fan-out control) so the candidate join stays sane
        pairs = dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.6, max_shingle_df=50)
        ids = docs.select("doc_id", F.length("text").alias("q"))
        kept = step(
            "dedup_keep_best",
            lambda: dedup.dedup_keep_best(ids, pairs, "q").filter("kept").count(),
        )
        out["counts"]["dedup_kept"] = kept
        out["total_sec"] = round(sum(out["timings"].values()), 2)
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
