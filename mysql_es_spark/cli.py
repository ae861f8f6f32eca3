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
    from .operators.relations import apply_withs, enrich_turns, with_rollup
    from .plans.build import build_index

    spark = _session(args)
    river = None
    if getattr(args, "river", None):
        with open(args.river) as f:
            river = json.load(f)
    jdbc_conf = dict(river.get("jdbc", {})) if river else {}
    if jdbc_conf:
        # the reference's front door: snapshot the RDBMS (river.json "my"
        # block ⇒ our "jdbc" block), not a parquet export
        from .sources.jdbc import read_snapshot

        kw = dict(jdbc_conf)
        df = read_snapshot(spark, kw.pop("url"), kw.pop("table"), **kw)
    elif args.input:
        df = spark.read.parquet(args.input)
    else:
        raise SystemExit("build needs --input or a --river config with a jdbc section")
    cfg = _cfg(args)
    if getattr(args, "template_repo", None):
        # ES composable index templates: settings resolved by the new
        # index's NAME (dir basename); explicit flags (already folded
        # into cfg by _cfg) act as the request-level overrides and win
        from .plans.index_templates import config_for

        name = os.path.basename(os.path.normpath(args.index_dir))
        cfg = config_for(args.template_repo, name, base=None).with_(
            **{
                k: getattr(cfg, k)
                for k in (
                    "n_buckets", "wave_size", "salt_docs",
                    "term_buckets", "block_size",
                )
                if getattr(args, k, None) is not None
            }
        )
        if args.edge_ngram:
            cfg = cfg.with_(edge_ngram=True)
        if args.with_positions:
            cfg = cfg.with_(with_positions=True)
    if river is not None:
        # one declarative file = the reference's etc/river.json: index
        # settings + relations/withs enrichment, explicit flags win
        ix_settings = dict(river.get("index", {}))
        for name in ("n_buckets", "wave_size", "salt_docs", "term_buckets", "block_size"):
            if getattr(args, name, None) is not None:
                ix_settings.pop(name, None)
        if args.edge_ngram:
            ix_settings.pop("edge_ngram", None)
        if args.with_positions:
            ix_settings.pop("with_positions", None)
        if ix_settings:
            cfg = cfg.with_(**ix_settings)
        withs = river.get("withs", [])
        if withs:
            tables = {
                name: spark.read.parquet(path)
                for name, path in river.get("tables", {}).items()
            }
            df = apply_withs(
                df,
                river.get("base_table", "transcripts"),
                withs,
                river.get("relations", {}),
                tables,
                nested=bool(river.get("nested", False)),
            )
        # the reference syncs joined columns INTO the indexed doc (a
        # comment is searchable by its joined user's name); here the
        # declared attached columns fold into the analyzed text
        extra = river.get("index_extra_text", [])
        if extra:
            from pyspark.sql import functions as F

            df = df.withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.coalesce(F.col("text"), F.lit("")),
                    *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in extra],
                ),
            )
    if args.enrich:
        # parent/child joins before indexing (north_rule; the reference's
        # relations/withs subsystem, SURVEY.md §2.3)
        if args.conversations and args.owners:
            convs = spark.read.parquet(args.conversations)
            owners = spark.read.parquet(args.owners)
            df = enrich_turns(df, convs, owners, nested=False)
        df = with_rollup(df)
    t0 = time.monotonic()
    metrics = build_index(spark, df, args.index_dir, cfg, resume=args.resume)
    metrics["build_sec"] = round(time.monotonic() - t0, 2)
    if jdbc_conf:
        # persist the river coordinates next to the index (the reference
        # keeps them in river.json) so `river-sync` needs only --index-dir
        from .sources.jdbc import _river_meta_path

        with open(_river_meta_path(args.index_dir), "w") as f:
            json.dump(jdbc_conf, f)
        metrics["river"] = {"url": jdbc_conf["url"], "table": jdbc_conf["table"]}
    return metrics


def cmd_river_sync(args) -> dict:
    from .sources.jdbc import river_sync

    spark = _session(args)
    return river_sync(spark, args.index_dir, batch_id=args.batch_id, merge=args.merge)


def cmd_compact(args) -> dict:
    from .plans.compact import compact_index

    spark = _session(args)
    t0 = time.monotonic()
    reshard = {
        k: v
        for k, v in (
            ("salt_docs", args.reshard_salt_docs),
            ("term_buckets", args.reshard_term_buckets),
            ("block_size", args.reshard_block_size),
        )
        if v is not None
    }
    stats = compact_index(
        spark, args.index_dir, args.out,
        purge_deletes=not args.no_purge, reshard=reshard or None,
    )
    stats["compact_sec"] = round(time.monotonic() - t0, 2)
    return stats


def cmd_stats(args) -> dict:
    from .operators.query import index_stats

    spark = _session(args)
    return index_stats(spark, args.index_dir)


def cmd_mapping(args) -> dict:
    from .operators.query import index_mapping

    spark = _session(args)
    return index_mapping(spark, args.index_dir)


def _parse_fields(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, boost = part.partition(":")
        out[name.strip()] = float(boost) if boost else 1.0
    return out


def cmd_build_mf(args) -> dict:
    from .plans.multi_field import build_multi_field

    spark = _session(args)
    df = spark.read.parquet(args.input)
    t0 = time.monotonic()
    out = build_multi_field(spark, df, args.root, _parse_fields(args.fields), _cfg(args))
    return {
        "fields": list(out),
        "n_docs": out[next(iter(out))]["n_docs_built"],
        "build_sec": round(time.monotonic() - t0, 2),
    }


def cmd_query_mf(args) -> dict:
    from .plans.multi_field import combined_fields_topk, multi_match_topk

    spark = _session(args)
    if args.type == "combined_fields":
        rows = combined_fields_topk(spark, args.root, args.query, k=args.k).collect()
    else:
        rows = multi_match_topk(
            spark, args.root, args.query, k=args.k, mtype=args.type,
            tie_breaker=args.tie_breaker,
        ).collect()
    return {"hits": [{"docid": r.docid, "score": round(r.score, 4)} for r in rows]}


def cmd_percolate(args) -> dict:
    from .operators.percolate import percolate

    spark = _session(args)
    with open(args.queries) as f:
        stored = [(q["id"], q["query"], q.get("mode", "any")) for q in json.load(f)]
    docs = spark.read.parquet(args.input)
    rows = percolate(
        spark, docs, stored, id_col=args.id_col, text_col=args.text_col
    ).collect()
    return {"matches": [{args.id_col: r[0], "query_id": r[1]} for r in rows]}


def cmd_snapshot(args) -> dict:
    from .plans.snapshot import (
        create_snapshot,
        delete_snapshot,
        list_snapshots,
        prune_snapshots,
        restore_snapshot,
    )

    if args.snap_action in ("create", "restore") and not (args.name and args.index_dir):
        raise SystemExit("snapshot create/restore require --name and --index-dir")
    if args.snap_action == "create":
        return create_snapshot(args.index_dir, args.repo, args.name)
    if args.snap_action == "restore":
        return restore_snapshot(args.repo, args.name, args.index_dir)
    if args.snap_action == "delete":
        if not args.name:
            raise SystemExit("snapshot delete requires --name")
        return delete_snapshot(args.repo, args.name)
    if args.snap_action == "prune":
        return prune_snapshots(args.repo, keep_last=args.keep_last)
    if args.snap_action == "verify":
        from .plans.snapshot import verify_repo

        return verify_repo(args.repo, deep=args.deep)
    return {"snapshots": list_snapshots(args.repo)}


def cmd_rollover(args) -> dict:
    from .plans.alias import rollover

    spark = _session(args)
    # only override the new generation's physical config when the user
    # actually passed physical flags; otherwise inherit the old
    # generation's persisted layout (positions, buckets, ...)
    overridden = any(
        getattr(args, n, None) is not None
        for n in ("n_buckets", "wave_size", "salt_docs", "term_buckets", "block_size")
    ) or args.edge_ngram or args.with_positions
    return rollover(
        spark, args.alias, cfg=_cfg(args) if overridden else None,
        max_docs=args.max_docs, max_bytes=args.max_bytes,
    )


def cmd_ilm(args) -> dict:
    from .plans import ilm

    if args.ilm_action == "put-policy":
        return {"policy": ilm.put_policy(args.alias, json.loads(args.policy))}
    if args.ilm_action == "explain":
        now = args.now if args.now is not None else time.time()
        return {"generations": ilm.explain_lifecycle(args.alias, now)}
    # tick: the only action that needs a SparkSession (rollover/compact)
    spark = _session(args)
    now = args.now if args.now is not None else time.time()
    return ilm.ilm_tick(spark, args.alias, now)


def cmd_transform(args) -> dict:
    from .plans.transform import TransformConfig, run_transform, tick_transform

    spec = json.loads(args.config)
    cfg = TransformConfig(
        mode=spec.get("mode", "pivot"),
        group_by=tuple(spec.get("group_by", ())),
        aggs=dict(spec.get("aggs", {})),
        unique_key=tuple(spec.get("unique_key", ())),
        sort_field=spec.get("sort_field", "ts"),
        tiebreak=spec.get("tiebreak"),
        sync_field=spec.get("sync_field", "ts"),
        n_parts=int(spec.get("n_parts", 16)),
    )
    spark = _session(args)
    src = spark.read.parquet(args.source)
    t0 = time.monotonic()
    fn = run_transform if args.transform_action == "run" else tick_transform
    res = fn(spark, src, args.dest, cfg)
    return {**res, "latency_sec": round(time.monotonic() - t0, 3)}


def cmd_esql(args) -> dict:
    from .functions.esql import esql, esql_search

    spark = _session(args)
    t0 = time.monotonic()
    if args.index:
        indexes = dict(kv.split("=", 1) for kv in args.index)
        out = esql_search(args.query, spark, indexes)
    else:
        tables = {
            name: spark.read.parquet(path)
            for name, path in (kv.split("=", 1) for kv in args.table or [])
        }
        out = esql(args.query, tables, spark=spark)
    rows = out.limit(args.max_rows).collect()
    return {
        "columns": out.columns,
        "rows": [list(r) for r in rows],
        "latency_sec": round(time.monotonic() - t0, 3),
    }


def cmd_eql(args) -> dict:
    from .operators.eql import sample_matches, sequence_matches

    spark = _session(args)
    t0 = time.monotonic()
    ev = spark.read.parquet(args.source)
    if args.eql_mode == "sequence":
        out = sequence_matches(
            ev, args.by.split(","), args.step, time_col=args.time_col,
            tiebreak=args.tiebreak, maxspan_seconds=args.maxspan,
            until=args.until, first_only=args.first_only,
        )
    else:
        out = sample_matches(
            ev, args.by.split(","), args.step,
            tiebreak=args.tiebreak, time_col=args.time_col,
        )
    rows = out.limit(args.max_rows).collect()
    return {
        "columns": out.columns,
        "rows": [list(map(str, r)) for r in rows],
        "latency_sec": round(time.monotonic() - t0, 3),
    }


def cmd_datastream(args) -> dict:
    from .plans import data_stream as ds

    spark = _session(args)
    if args.ds_action == "create":
        return ds.create_data_stream(spark, args.stream, _cfg(args))
    if args.ds_action == "append":
        return ds.append_batch(spark, args.stream, spark.read.parquet(args.input))
    if args.ds_action == "expire":
        return {"dropped": ds.expire_generations(spark, args.stream, args.older_than)}
    if args.ds_action == "forcemerge":
        return ds.forcemerge_stream(spark, args.stream, on_dup=args.on_dup)
    out = ds.search_stream(spark, args.stream, args.query, k=args.k)
    return {
        "hits": [
            {"index": r["index"], "docid": r["docid"], "score": round(r["score"], 4)}
            for r in out.collect()
        ]
    }


def cmd_reindex(args) -> dict:
    from .plans.deletes import reindex

    spark = _session(args)
    t0 = time.monotonic()
    # only build a dst config when the user overrode physical flags;
    # otherwise inherit the source's persisted layout
    overrode = any(
        getattr(args, n, None) is not None
        for n in ("n_buckets", "wave_size", "salt_docs", "term_buckets", "block_size")
    ) or args.edge_ngram or args.with_positions
    stats = reindex(
        spark, args.index_dir, args.out, query=args.query or "",
        doc_filter=args.filter, dst_cfg=_cfg(args) if overrode else None,
    )
    stats["reindex_sec"] = round(time.monotonic() - t0, 2)
    return stats


def cmd_delete(args) -> dict:
    from .plans.deletes import delete_by_query

    spark = _session(args)
    t0 = time.monotonic()
    n = delete_by_query(
        spark, args.index_dir, query=args.query or "", doc_filter=args.filter, cfg=_cfg(args)
    )
    return {"docs_deleted": n, "latency_sec": round(time.monotonic() - t0, 3)}


def cmd_update(args) -> dict:
    from .plans.deletes import update_by_query

    spark = _session(args)
    t0 = time.monotonic()
    set_exprs = dict(kv.split("=", 1) for kv in args.set)
    res = update_by_query(
        spark, args.index_dir, set_exprs,
        query=args.query or "", doc_filter=args.filter, cfg=_cfg(args),
    )
    return {**res, "latency_sec": round(time.monotonic() - t0, 3)}


def cmd_suggest(args) -> dict:
    from .operators.query import suggest_phrase, suggest_terms

    spark = _session(args)
    if args.mode == "phrase":
        rows = suggest_phrase(
            spark, args.index_dir, args.text, size=args.size,
            max_edits=args.max_edits, cfg=_cfg(args),
        ).collect()
        return {
            "suggestions": [
                {"phrase": r["phrase"], "score": round(r["score"], 4),
                 "n_edits": r["n_edits"]}
                for r in rows
            ]
        }
    rows = suggest_terms(
        spark, args.index_dir, args.text, size=args.size, max_edits=args.max_edits,
        cfg=_cfg(args),
    ).collect()
    return {
        "suggestions": [
            {"input": r["input_term"], "term": r["suggestion"],
             "distance": r["distance"], "df": r["df"]}
            for r in rows
        ]
    }


def cmd_count(args) -> dict:
    from .operators.query import match_count

    spark = _session(args)
    n = match_count(spark, args.index_dir, args.query, cfg=_cfg(args)).collect()[0]
    return {"count": int(n["n_matches"])}


def cmd_get(args) -> dict:
    from .operators.query import get_docs

    spark = _session(args)
    rows = get_docs(spark, args.index_dir, args.ids.split(",")).collect()
    return {
        "docs": [
            {"doc_key": r["doc_key"], "conv_id": r["conv_id"],
             "turn_idx": r["turn_idx"], "role": r["role"], "text": r["text"],
             "tool": r["tool"]}
            for r in rows
        ]
    }


def cmd_analyze(args) -> dict:
    """ES _analyze: show the analyzer's token stream for a text — the
    search analyzer by default, the edge-ngram index analyzer with
    --edge-ngram (pure driver-side, no Spark job)."""
    from .functions.analyze import edge_ngrams, tokenize_text

    toks = tokenize_text(args.text)
    if args.edge_ngram:
        cfg = _cfg(args)
        toks = edge_ngrams(toks, cfg.edge_ngram_min, cfg.edge_ngram_max)
    return {"tokens": toks}


def cmd_disk_usage(args) -> dict:
    """ES _disk_usage: per-table/per-field compressed byte footprint from
    the parquet footers (no data scan)."""
    from .operators.query import disk_usage

    spark = _session(args)
    return disk_usage(spark, args.index_dir)


def cmd_validate(args) -> dict:
    """ES _validate/query?explain=true: compile the query against the
    index without executing it (metadata-only)."""
    from .operators.query import validate_query

    spark = _session(args)
    return validate_query(spark, args.index_dir, args.type, args.query, cfg=_cfg(args))


def cmd_explain(args) -> dict:
    from .operators.query import explain_score

    spark = _session(args)
    rows = explain_score(spark, args.index_dir, args.query, args.docid, cfg=_cfg(args)).collect()
    return {
        "docid": args.docid,
        "score": round(sum(r["contrib"] for r in rows), 6),
        "terms": [
            {"term": r["term"], "tf": r["tf"], "dl": r["dl"], "df": r["df"],
             "idf": round(r["idf"], 6), "tf_norm": round(r["tf_norm"], 6),
             "contrib": round(r["contrib"], 6)}
            for r in rows
        ],
    }


def cmd_aggs(args) -> dict:
    from .operators import aggs as esaggs

    spark = _session(args)
    cfg = _cfg(args)
    kind = args.agg
    if kind == "date_histogram":
        df = esaggs.date_histogram(spark, args.index_dir, args.query, cfg=cfg)
    elif kind == "histogram":
        df = esaggs.histogram(spark, args.index_dir, args.query, interval=args.interval, cfg=cfg)
    elif kind == "extended_stats":
        df = esaggs.extended_stats(spark, args.index_dir, args.query, cfg=cfg)
    elif kind == "cardinality":
        df = esaggs.cardinality(spark, args.index_dir, args.query, args.field, cfg=cfg)
    elif kind == "top_hits":
        df = esaggs.top_hits(spark, args.index_dir, args.query, args.field, size=args.size, cfg=cfg)
    elif kind == "categorize_text":
        df = esaggs.categorize_text(spark, args.index_dir, args.query, size=args.size, cfg=cfg)
    else:
        df = esaggs.significant_terms(spark, args.index_dir, args.query, size=args.size, cfg=cfg)
    return {"agg": kind, "buckets": [r.asDict() for r in df.collect()]}


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
    elif args.mode == "span":
        df = phrase_topk(spark, args.index_dir, args.query, ordered=False,
                         slop=args.slop, **common)
    elif args.mode == "conjunctive":
        df = bm25_topk_conjunctive(spark, args.index_dir, args.query, **common)
    elif args.mode == "qs":
        from .operators.query import query_string_topk

        df = query_string_topk(spark, args.index_dir, args.query, **common)
    elif args.mode == "lm":
        from .operators.query import lm_dirichlet_topk

        df = lm_dirichlet_topk(spark, args.index_dir, args.query, **common)
    elif args.mode == "wildcard":
        from .operators.query import wildcard_topk

        df = wildcard_topk(spark, args.index_dir, args.query, **common)
    elif args.mode == "regexp":
        from .operators.query import regexp_topk

        df = regexp_topk(spark, args.index_dir, args.query, **common)
    elif args.mode == "sqs":
        from .operators.query import simple_query_string_topk

        df = simple_query_string_topk(spark, args.index_dir, args.query, **common)
    elif args.mode == "constant":
        from .operators.query import constant_score_topk

        df = constant_score_topk(spark, args.index_dir, args.query, **common)
    elif args.mode == "mbp":
        from .operators.query import match_bool_prefix_topk

        df = match_bool_prefix_topk(spark, args.index_dir, args.query, **common)
    elif args.mode == "sv":
        from .operators.query import sparse_vector_topk

        # "term:weight term2:weight2 bare_term" — bare terms weigh 1.0
        weights: dict[str, float] = {}
        for part in args.query.split():
            tok, _, w = part.partition(":")
            weights[tok] = weights.get(tok, 0.0) + (float(w) if w else 1.0)
        df = sparse_vector_topk(
            spark, args.index_dir, weights,
            min_score=getattr(args, "min_score", None), **common,
        )
    elif getattr(args, "ids", None):
        from .operators.query import ids_topk

        df = ids_topk(
            spark, args.index_dir, args.ids.split(","), k=args.k,
            cfg=_cfg(args), with_keys=args.with_keys,
        )
    else:
        df = bm25_topk(
            spark, args.index_dir, args.query, mode=args.mode,
            min_score=getattr(args, "min_score", None), **common,
        )
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
    b.add_argument(
        "--input", default=None,
        help="transcripts parquet path (omit when the --river config has "
        "a jdbc section — the snapshot then comes over JDBC)",
    )
    b.add_argument("--index-dir", required=True)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--enrich", action="store_true", help="join parents + conv rollup first")
    b.add_argument("--conversations", default=None)
    b.add_argument("--owners", default=None)
    b.add_argument(
        "--river", default=None,
        help="declarative config JSON (the reference's river.json analog): "
        '{"index": {...IndexConfig fields...}, "base_table": ..., '
        '"relations": {...}, "withs": [...], "tables": {name: path}, '
        '"nested": false, "jdbc": {"url": ..., "table": ..., "driver": '
        "...}} — with a jdbc section the snapshot is read over JDBC "
        "(the reference's my/host+db block) instead of --input",
    )
    b.add_argument(
        "--template-repo", default=None,
        help="index-template repo dir (ES _index_template): settings "
        "resolved by the index dir's basename; explicit flags win",
    )
    b.set_defaults(fn=cmd_build)

    rs = sub.add_parser(
        "river-sync",
        help="one CDC tick for a JDBC-river index: fresh snapshot, diff "
        "vs the forward table, rebuild only affected buckets (the "
        "reference's binlog-tail loop, snapshot-diff flavored)",
    )
    rs.add_argument("--index-dir", required=True)
    rs.add_argument("--batch-id", type=int, default=-1)
    rs.add_argument("--merge", choices=["auto", "never"], default="auto")
    rs.set_defaults(fn=cmd_river_sync)

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index-dir", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument(
        "--mode",
        choices=["auto", "simple", "pruned", "conjunctive", "phrase", "span",
                 "qs", "lm", "wildcard", "regexp", "sqs", "constant", "mbp",
                 "sv"],
        default="pruned",
    )
    q.add_argument("--slop", type=int, default=1, help="span/phrase proximity slop")
    q.add_argument(
        "--min-score", type=float, default=None, dest="min_score",
        help="request-level score floor (simple/pruned modes)",
    )
    q.add_argument(
        "--ids", default=None,
        help="comma-separated doc_keys: ids query instead of text search",
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
    c.add_argument(
        "--no-purge",
        action="store_true",
        help="carry soft deletes along instead of physically purging them",
    )
    c.add_argument("--reshard-salt-docs", type=int, default=None,
                   help="re-encode with a new docids-per-salt (ES _split/_shrink analog)")
    c.add_argument("--reshard-term-buckets", type=int, default=None,
                   help="re-encode with a new term partition count")
    c.add_argument("--reshard-block-size", type=int, default=None,
                   help="re-encode with a new postings-per-block")
    c.set_defaults(fn=cmd_compact)

    st = sub.add_parser("stats", help="index observability: docs/terms/deletes/bytes")
    st.add_argument("--index-dir", required=True)
    st.set_defaults(fn=cmd_stats)

    mp = sub.add_parser("mapping", help="field schema + analyzer + physical layout")
    mp.add_argument("--index-dir", required=True)
    mp.set_defaults(fn=cmd_mapping)

    r = sub.add_parser("reindex", help="build a new index from the matching live subset")
    r.add_argument("--index-dir", required=True, help="source index")
    r.add_argument("--out", required=True, help="destination index")
    r.add_argument("--query", default=None, help="fulltext match (disjunctive)")
    r.add_argument("--filter", default=None, help="SQL predicate over forward columns")
    r.set_defaults(fn=cmd_reindex)

    d = sub.add_parser("delete", help="soft-delete docs by query and/or forward predicate")
    d.add_argument("--index-dir", required=True)
    d.add_argument("--query", default=None, help="fulltext match (disjunctive)")
    d.add_argument("--filter", default=None, help="SQL predicate over forward columns")
    d.set_defaults(fn=cmd_delete)

    u = sub.add_parser("update", help="ES _update_by_query: scripted column updates")
    u.add_argument("--index-dir", required=True)
    u.add_argument("--query", default=None, help="fulltext match (disjunctive)")
    u.add_argument("--filter", default=None, help="SQL predicate over forward columns")
    u.add_argument(
        "--set", action="append", required=True, metavar="COL=EXPR",
        help="column=SQL-expression (repeatable), e.g. --set \"tool='x'\"",
    )
    u.set_defaults(fn=cmd_update)

    sg = sub.add_parser("suggest", help="term suggester (did-you-mean) from the dictionary")
    sg.add_argument("--index-dir", required=True)
    sg.add_argument("--text", required=True)
    sg.add_argument("--size", type=int, default=5)
    sg.add_argument("--max-edits", type=int, default=2, dest="max_edits")
    sg.add_argument("--mode", choices=["term", "phrase"], default="term")
    sg.set_defaults(fn=cmd_suggest)

    cn = sub.add_parser("count", help="ES _count: matching live docs")
    cn.add_argument("--index-dir", required=True)
    cn.add_argument("--query", required=True)
    cn.set_defaults(fn=cmd_count)

    gt = sub.add_parser("get", help="ES _mget: fetch stored docs by doc_key")
    gt.add_argument("--index-dir", required=True)
    gt.add_argument("--ids", required=True, help="comma list of conv_id:turn_idx keys")
    gt.set_defaults(fn=cmd_get)

    an = sub.add_parser("analyze", help="ES _analyze: the analyzer's token stream")
    an.add_argument("--text", required=True)
    an.set_defaults(fn=cmd_analyze)

    du = sub.add_parser("disk-usage", help="ES _disk_usage: per-field byte footprint")
    du.add_argument("--index-dir", required=True)
    du.set_defaults(fn=cmd_disk_usage)

    va = sub.add_parser("validate", help="ES _validate/query: compile without executing")
    va.add_argument("--index-dir", required=True)
    va.add_argument("--type", default="match",
                    help="match|match_phrase|match_phrase_prefix|prefix|wildcard|regexp|query_string|exists")
    va.add_argument("--query", required=True)
    va.set_defaults(fn=cmd_validate)

    e = sub.add_parser("explain", help="per-term BM25 breakdown for one doc")
    e.add_argument("--index-dir", required=True)
    e.add_argument("--query", required=True)
    e.add_argument("--docid", type=int, required=True)
    e.set_defaults(fn=cmd_explain)

    a = sub.add_parser("aggs", help="ES-style aggregations over matching docs")
    a.add_argument("--index-dir", required=True)
    a.add_argument("--query", required=True)
    a.add_argument(
        "--agg",
        choices=["date_histogram", "histogram", "extended_stats", "cardinality",
                 "top_hits", "significant_terms", "categorize_text"],
        required=True,
    )
    a.add_argument("--field", default="role", help="group/target field where applicable")
    a.add_argument("--interval", type=int, default=20, help="histogram bucket width")
    a.add_argument("--size", type=int, default=10)
    a.set_defaults(fn=cmd_aggs)

    bm = sub.add_parser("build-mf", help="build per-field sub-indexes (multi_match)")
    bm.add_argument("--input", required=True, help="transcripts parquet path")
    bm.add_argument("--root", required=True, help="multi-field index root")
    bm.add_argument(
        "--fields", default="text:1.0",
        help="comma list of field[:boost], e.g. text:1.0,tool:2.0",
    )
    bm.set_defaults(fn=cmd_build_mf)

    qm = sub.add_parser("query-mf", help="multi_match over a multi-field index")
    qm.add_argument("--root", required=True)
    qm.add_argument("--query", required=True)
    qm.add_argument("-k", type=int, default=10)
    qm.add_argument(
        "--type",
        choices=["best_fields", "most_fields", "cross_fields", "combined_fields"],
        default="best_fields",
    )
    qm.add_argument("--tie-breaker", type=float, default=0.0, dest="tie_breaker")
    qm.set_defaults(fn=cmd_query_mf)

    pc = sub.add_parser("percolate", help="match stored queries against a doc table")
    pc.add_argument("--input", required=True, help="docs parquet path")
    pc.add_argument("--queries", required=True,
                    help='JSON file: [{"id": ..., "query": ..., "mode": "all"|"any"}]')
    pc.add_argument("--id-col", default="doc_id", dest="id_col")
    pc.add_argument("--text-col", default="text", dest="text_col")
    pc.set_defaults(fn=cmd_percolate)

    ro = sub.add_parser("rollover", help="rotate the alias's write index (ES _rollover)")
    ro.add_argument("--alias", required=True)
    ro.add_argument("--max-docs", type=int, default=None, dest="max_docs")
    ro.add_argument("--max-bytes", type=int, default=None, dest="max_bytes")
    ro.set_defaults(fn=cmd_rollover)

    sn = sub.add_parser("snapshot", help="incremental snapshot repo (ES _snapshot)")
    sn.add_argument(
        "snap_action", choices=["create", "restore", "list", "delete", "prune", "verify"]
    )
    sn.add_argument("--deep", action="store_true",
                    help="verify: re-hash every referenced blob (bit-rot check)")
    sn.add_argument("--repo", required=True, help="snapshot repository directory")
    sn.add_argument("--name", default=None, help="snapshot name (create/restore/delete)")
    sn.add_argument("--keep-last", type=int, default=5,
                    help="retention for prune: newest snapshots to keep")
    sn.add_argument(
        "--index-dir", default=None,
        help="index to snapshot (create) or restore target (restore)",
    )
    sn.set_defaults(fn=cmd_snapshot)

    il = sub.add_parser("ilm", help="index lifecycle: policy-driven rollover/forcemerge/delete")
    il.add_argument("ilm_action", choices=["put-policy", "tick", "explain"])
    il.add_argument("--alias", required=True)
    il.add_argument("--policy", default=None, help="policy JSON (put-policy)")
    il.add_argument("--now", type=float, default=None,
                    help="clock override in epoch seconds (default: wall clock)")
    il.set_defaults(fn=cmd_ilm)

    tr = sub.add_parser(
        "transform", help="ES _transform: pivot/latest entity table from a source table"
    )
    tr.add_argument("transform_action", choices=["run", "tick"])
    tr.add_argument("--source", required=True, help="parquet path of the source table")
    tr.add_argument("--dest", required=True, help="destination transform directory")
    tr.add_argument(
        "--config", required=True,
        help='TransformConfig JSON, e.g. {"mode":"pivot","group_by":["user_id"],'
             '"aggs":{"n":"count(*)"},"sync_field":"ts"}',
    )
    tr.set_defaults(fn=cmd_transform)

    eq = sub.add_parser("esql", help="ES|QL pipe over parquet tables or built indexes")
    eq.add_argument("--query", required=True, help="the ES|QL pipe")
    eq.add_argument("--table", action="append", default=None,
                    help="name=parquet_path (repeatable)")
    eq.add_argument("--index", action="append", default=None,
                    help="name=index_dir (repeatable; enables match())")
    eq.add_argument("--max-rows", type=int, default=100)
    eq.set_defaults(fn=cmd_esql)

    el = sub.add_parser("eql", help="EQL sequence/sample over an event table")
    el.add_argument("eql_mode", choices=["sequence", "sample"])
    el.add_argument("--source", required=True, help="events parquet path")
    el.add_argument("--by", required=True, help="join key column(s), comma-sep")
    el.add_argument("--step", action="append", required=True,
                    help="step predicate (repeatable, in order)")
    el.add_argument("--tiebreak", required=True, help="total-order id column")
    el.add_argument("--time-col", default="ts")
    el.add_argument("--maxspan", type=float, default=None, help="seconds")
    el.add_argument("--until", default=None, help="expel-partials predicate")
    el.add_argument("--first-only", action="store_true")
    el.add_argument("--max-rows", type=int, default=100)
    el.set_defaults(fn=cmd_eql)

    dstr = sub.add_parser("datastream", help="append-only data stream over generations")
    dstr.add_argument(
        "ds_action", choices=["create", "append", "search", "expire", "forcemerge"]
    )
    dstr.add_argument("--stream", required=True, help="data stream alias dir")
    dstr.add_argument("--input", default=None, help="batch parquet path (append)")
    dstr.add_argument("--query", default=None, help="query string (search)")
    dstr.add_argument("-k", type=int, default=10)
    dstr.add_argument("--older-than", default=None, help="retention cutoff (expire)")
    dstr.add_argument("--on-dup", default="error", choices=["error", "last"],
                      help="cross-generation duplicate doc_key policy (forcemerge)")
    dstr.set_defaults(fn=cmd_datastream)

    args = ap.parse_args(argv)
    print(json.dumps(args.fn(args), default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
