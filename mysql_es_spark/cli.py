"""spark-submit entry point — build / resume / query / compact / gen.

The north rule requires the engine to "run via spark-submit --py-files on a
multi-executor cluster". This module is that entry point; package the
library with ``python scripts/package_pyfiles.py`` (writes
``dist/mysql_es_spark.zip``) and submit:

    spark-submit --py-files dist/mysql_es_spark.zip \
        --master <cluster-master> \
        cli_submit.py build --input /data/transcripts --index-dir /data/ix \
        --enrich --conversations /data/conversations --owners /data/owners

(Locally, ``python -m mysql_es_spark.cli …`` runs the same code on
``local[$SPARK_GRAFT_CPUS]``.) Under spark-submit the session comes from
``SparkSession.builder.getOrCreate()`` so the submit-time ``--master`` /
``--num-executors`` / conf flags win; local runs fall back to
:func:`mysql_es_spark.session.get_spark`.

The reference's analog is ``Main.main`` + ``etc/*.json``
(/root/reference/src/main/java/org/fly/sync/Main.java:16-73): one process
that connects, validates, bulk-dumps, then tails. Here each lifecycle phase
is a subcommand; "resume" is ``build --resume`` (lineage-driven wave skip,
the analog of the binlog-position restart, Setting.java:179-210).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import SparkSession

from .config import IndexConfig


def _session(args) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    if os.environ.get("SPARK_SUBMIT_MODE") or args.from_submit:
        # spark-submit owns master/executor topology; just attach.
        spark = SparkSession.builder.appName("mysql_es_spark").getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        return spark
    from .session import get_spark

    return get_spark("mysql_es_spark-cli", cores=args.cores)


def _cfg(args) -> IndexConfig:
    kw = {}
    for name in ("n_buckets", "wave_size", "salt_docs", "term_buckets", "block_size"):
        v = getattr(args, name, None)
        if v is not None:
            kw[name] = v
    if getattr(args, "edge_ngram", False):
        kw["edge_ngram"] = True
    if getattr(args, "with_positions", False):
        kw["with_positions"] = True
    return IndexConfig(**kw)


def cmd_gen(args) -> dict:
    from .corpus import write_corpus

    spark = _session(args)
    return write_corpus(spark, args.out, args.turns, seed=args.seed)


def cmd_build(args) -> dict:
    from .operators.relations import enrich_turns, with_rollup
    from .plans.build import build_index

    spark = _session(args)
    df = spark.read.parquet(args.input)
    if args.enrich:
        # parent/child joins before indexing (north_rule; the reference's
        # relations/withs subsystem, SURVEY.md §2.3)
        if args.conversations and args.owners:
            convs = spark.read.parquet(args.conversations)
            owners = spark.read.parquet(args.owners)
            df = enrich_turns(df, convs, owners, nested=False)
        df = with_rollup(df)
    t0 = time.monotonic()
    metrics = build_index(spark, df, args.index_dir, _cfg(args), resume=args.resume)
    metrics["build_sec"] = round(time.monotonic() - t0, 2)
    return metrics


def cmd_compact(args) -> dict:
    from .plans.compact import compact_index

    spark = _session(args)
    t0 = time.monotonic()
    stats = compact_index(spark, args.index_dir, args.out)
    stats["compact_sec"] = round(time.monotonic() - t0, 2)
    return stats


def cmd_query(args) -> dict:
    from .operators.query import (
        bm25_filtered_topk,
        bm25_topk,
        bm25_topk_conjunctive,
        phrase_topk,
    )

    spark = _session(args)
    t0 = time.monotonic()
    common = dict(k=args.k, cfg=_cfg(args), with_keys=args.with_keys)
    if getattr(args, "filter", None):
        df = bm25_filtered_topk(spark, args.index_dir, args.query, args.filter, **common)
    elif args.mode == "phrase":
        df = phrase_topk(spark, args.index_dir, args.query, **common)
    elif args.mode == "conjunctive":
        df = bm25_topk_conjunctive(spark, args.index_dir, args.query, **common)
    else:
        df = bm25_topk(spark, args.index_dir, args.query, mode=args.mode, **common)
    rows = df.collect()
    out = {
        "query": args.query,
        "k": args.k,
        "mode": args.mode,
        "latency_sec": round(time.monotonic() - t0, 3),
        "hits": [
            {"docid": r["docid"], "score": round(r["score"], 6)}
            | ({"doc_key": r["doc_key"]} if args.with_keys else {})
            | ({"n_hits": r["n_hits"]} if "n_hits" in df.columns else {})
            for r in rows
        ],
    }
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="mysql_es_spark")
    ap.add_argument("--cores", type=int, default=None, help="local[N] cores (local mode only)")
    ap.add_argument(
        "--from-submit",
        action="store_true",
        help="attach to the spark-submit-provided session instead of building local[N]",
    )
    for name in ("n_buckets", "wave_size", "salt_docs", "term_buckets", "block_size"):
        ap.add_argument(f"--{name.replace('_', '-')}", type=int, default=None, dest=name)
    ap.add_argument("--edge-ngram", action="store_true")
    ap.add_argument(
        "--with-positions",
        action="store_true",
        help="store token positions in posting blocks (enables --mode phrase)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="write a deterministic synthetic corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--turns", type=int, default=100_000)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_gen)

    b = sub.add_parser("build", help="build (or resume) the index")
    b.add_argument("--input", required=True, help="transcripts parquet path")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--enrich", action="store_true", help="join parents + conv rollup first")
    b.add_argument("--conversations", default=None)
    b.add_argument("--owners", default=None)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index-dir", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument(
        "--mode", choices=["simple", "pruned", "conjunctive", "phrase"], default="pruned"
    )
    q.add_argument("--with-keys", action="store_true")
    q.add_argument(
        "--filter",
        default=None,
        help="filter-context SQL predicate over the forward columns "
        "(non-scoring, e.g. \"role = 'assistant'\")",
    )
    q.set_defaults(fn=cmd_query)

    c = sub.add_parser("compact", help="segment-merge an index into one optimized wave")
    c.add_argument("--index-dir", required=True, help="source index")
    c.add_argument("--out", required=True, help="destination for the compacted index")
    c.set_defaults(fn=cmd_compact)

    args = ap.parse_args(argv)
    print(json.dumps(args.fn(args), default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
