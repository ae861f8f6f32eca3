"""Checkpoint-resumable index build — bucket waves, lineage, metrics.

The reference's bulk path (SURVEY.md §3.1: mysqldump → parse → relate →
bulk-write, with the binlog position persisted *after* the ES write so a
crash replays idempotently — Dumper.java:296-297, ChangePositionAction.java:
36-49, Setting.saveBinLog Setting.java:179-210) becomes:

  for each *wave* of conv_id hash buckets:
      docids → forward table → tokenize (one Arrow pass)
             → posting blocks / doc_lens / term_stats   [wave-partitioned]
      append lineage row  (the "position save" — strictly after the data)
  finalize: merge term_stats → term_dict; doc_lens → corpus_stats
            (idempotent overwrite, re-run on every resume)

Resume = read lineage, skip completed waves, overwrite any partially
written wave directory (idempotent-by-docid, the analog of the reference's
at-least-once + idempotent-by-_id contract, SURVEY.md §2.10 ST2). Because
bucket docid ranges are static (operators/docids.py), a wave rebuild never
perturbs other waves — which is also what makes the incremental/CDC path
(streaming/incremental.py) a per-bucket operation.

Scale notes: waves bound the blast radius of a failure and the size of any
single job; buckets-per-wave and n_buckets are config. With the input
Iceberg-partitioned by bucket(conv_id), each wave's ``filter(bucket IN …)``
is partition pruning, not a rescan.
"""

from __future__ import annotations

import json
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..config import IndexConfig
from ..operators.docids import assign_docids, with_bucket
from ..operators.postings import doc_lens, posting_blocks, term_stats, tokenized
from ..sources import tables as tbl

FORWARD_COLS = ["docid", "doc_key", "conv_id", "turn_idx", "role", "text", "tool", "ts", "bucket"]


class InjectedFailure(RuntimeError):
    """Raised by the test-only fault injector to simulate a killed build."""


# per-process scratch for wall-clock phase timings of the last build —
# observability for the scaling bench; not part of the durable metrics.
PHASE_TIMINGS: dict[int, dict[str, float]] = {}


def waves_of(cfg: IndexConfig) -> list[list[int]]:
    buckets = list(range(cfg.n_buckets))
    return [buckets[i : i + cfg.wave_size] for i in range(0, len(buckets), cfg.wave_size)]


def completed_waves(spark: SparkSession, index_dir: str) -> set[int]:
    if not tbl.exists(index_dir, "lineage"):
        return set()
    rows = (
        tbl.read(spark, index_dir, "lineage")
        .filter(F.col("status") == "complete")
        .select("wave")
        .collect()
    )
    return {int(r["wave"]) for r in rows}


def build_wave(
    spark: SparkSession,
    df_bucketed: DataFrame,
    index_dir: str,
    wave_id: int,
    wave_buckets: list[int],
    cfg: IndexConfig,
    source: str = "build",
    batch_id: int = -1,
) -> tuple:
    """Build one wave's tables; returns the lineage row (not yet written).

    Job shape per wave (scale notes):
    1. forward write — one shuffle (window by bucket for docids).
    2. postings/doc_lens/term_stats — tokenization reads the *written*
       forward table (so the docid window is never recomputed), is cached
       once, and feeds all three outputs.
    3. metrics read back from the written tables: the forward row count is
       a Parquet-metadata-only job and the postings agg reads just two
       small columns (never the blobs). (``Observation`` would save these
       two cheap jobs but its blocking ``get`` can hang when the listener
       misses the write action's completion — not worth the fragility.)
    """
    t0 = time.monotonic()
    phases = PHASE_TIMINGS.setdefault(wave_id, {})

    def mark(name: str, since: float) -> float:
        now = time.monotonic()
        phases[name] = round(now - since, 3)
        return now

    sub = df_bucketed.filter(F.col("bucket").isin(wave_buckets))
    docs = assign_docids(sub, cfg)
    fwd_schema = docs.select(*FORWARD_COLS).schema
    docs.select(*FORWARD_COLS).write.mode("overwrite").parquet(
        tbl.wave_dir(index_dir, "forward", wave_id)
    )
    t = mark("forward_write", t0)

    # explicit schemas on every wave read-back: a wave whose buckets hold
    # zero conversations writes an empty dir, and schema inference would
    # fail on it (empty buckets are normal at production bucket counts)
    fwd = (
        spark.read.schema(fwd_schema)
        .parquet(tbl.wave_dir(index_dir, "forward", wave_id))
        .select("docid", "text")
    )
    # The tokenize stage is Python-CPU-bound, so its parallelism must be ≥
    # the executor slots. At production scale the file scan yields plenty
    # of partitions; at bench scale the scan bin-packs the wave's small
    # files into a handful of partitions (maxPartitionBytes is sized for
    # JVM scans), silently capping the Arrow tokenize stage at ~4 tasks.
    # One cheap text shuffle restores full parallelism; no-op when the
    # scan is already wide enough.
    width = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "64")),
        spark.sparkContext.defaultParallelism,
    )
    if fwd.rdd.getNumPartitions() < width:
        fwd = fwd.repartition(width)
    tok = tokenized(fwd, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        posting_blocks(tok, cfg).write.partitionBy("term_bucket").mode("overwrite").parquet(
            tbl.wave_dir(index_dir, "postings", wave_id)
        )
        t = mark("postings_write", t)
        doc_lens(tok).write.mode("overwrite").parquet(
            tbl.wave_dir(index_dir, "doc_lens", wave_id)
        )
        t = mark("doc_lens_write", t)
        term_stats(tok).write.mode("overwrite").parquet(
            tbl.wave_dir(index_dir, "term_stats", wave_id)
        )
        t = mark("term_stats_write", t)
    finally:
        tok.unpersist()

    n_docs = (
        spark.read.schema(fwd_schema)
        .parquet(tbl.wave_dir(index_dir, "forward", wave_id))
        .count()
    )
    from ..operators.postings import BLOCK_POS_SCHEMA, BLOCK_SCHEMA

    blk = spark.read.schema(
        BLOCK_POS_SCHEMA if cfg.with_positions else BLOCK_SCHEMA
    ).parquet(tbl.wave_dir(index_dir, "postings", wave_id))
    agg = blk.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("np"), F.count(F.lit(1)).alias("nb")
    ).collect()[0]
    # empty-text docs (dl == 0) from the tiny doc_lens table — the
    # data-quality counter the reference only ever logged (ST8); a
    # two-column scan of per-doc ints, never the text blobs
    dla = (
        spark.read.schema("docid long, dl int")
        .parquet(tbl.wave_dir(index_dir, "doc_lens", wave_id))
        .agg(F.coalesce(F.sum((F.col("dl") == 0).cast("long")), F.lit(0)).alias("ne"))
        .collect()[0]
    )
    t = mark("metrics_read", t)
    from .metrics import append_metrics

    append_metrics(
        spark,
        index_dir,
        source,
        {
            "docs_indexed": int(n_docs),
            "postings_written": int(agg["np"]),
            "blocks_written": int(agg["nb"]),
            "empty_docs": int(dla["ne"]),
            "wall_ms": int((time.monotonic() - t0) * 1000),
        },
        wave=wave_id,
        batch_id=batch_id,
    )
    return (
        wave_id,
        wave_buckets,
        int(n_docs),
        int(agg["np"]),
        int(agg["nb"]),
        time.monotonic() - t0,
        "complete",
        datetime.now(timezone.utc),
    )


def commit_lineage(spark: SparkSession, index_dir: str, row: tuple) -> None:
    """The "position save": strictly after the wave's data is durable."""
    tbl.local_rows_df(spark, [row], tbl.LINEAGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(tbl.p(index_dir, "lineage"))


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = False,
    fail_after_waves: int | None = None,
) -> dict:
    """Build (or resume) the full index under ``index_dir``.

    Returns a metrics dict: waves run/skipped, docs indexed this run.
    """
    cfg = cfg or IndexConfig()
    PHASE_TIMINGS.clear()
    df = with_bucket(transcripts, cfg)

    done = completed_waves(spark, index_dir) if resume else set()
    ran, skipped, docs_this_run = [], [], 0
    for wave_id, wave_buckets in enumerate(waves_of(cfg)):
        if wave_id in done:
            skipped.append(wave_id)
            continue
        row = build_wave(spark, df, index_dir, wave_id, wave_buckets, cfg)
        commit_lineage(spark, index_dir, row)
        docs_this_run += row[2]
        ran.append(wave_id)
        if fail_after_waves is not None and len(ran) >= fail_after_waves:
            raise InjectedFailure(f"injected failure after wave {wave_id}")

    t_fin = time.monotonic()
    finalize(spark, index_dir, cfg)
    PHASE_TIMINGS["finalize"] = round(time.monotonic() - t_fin, 3)
    return {
        "waves_run": ran,
        "waves_skipped": skipped,
        "n_docs_built": docs_this_run,
        "n_buckets": cfg.n_buckets,
    }


def finalize(spark: SparkSession, index_dir: str, cfg: IndexConfig) -> None:
    """Merge per-wave partials into term_dict + corpus_stats (idempotent)."""
    from ..operators.query import invalidate_stats_cache

    invalidate_stats_cache(index_dir)
    ts = tbl.read(spark, index_dir, "term_stats")
    # range-partitioned + sorted by term: Parquet row-group min/max stats
    # then prune term-equality and StartsWith (prefix_topk) scans to the
    # few files/row-groups covering the lexicographic range — at a
    # 10^8-term production vocabulary a prefix query must not read the
    # whole dictionary
    (
        ts.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
        .repartitionByRange(max(1, cfg.term_buckets // 2), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(tbl.p(index_dir, "term_dict"))
    )
    dl = tbl.read(spark, index_dir, "doc_lens")
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl")
    ).collect()[0]
    # parquet-metadata-only count
    n_terms = spark.read.parquet(tbl.p(index_dir, "term_dict")).count()
    tbl.local_rows_df(
        spark,
        [(int(stats["n_docs"]), int(stats["sum_dl"]), int(n_terms), cfg.n_buckets)],
        tbl.CORPUS_STATS_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(tbl.p(index_dir, "corpus_stats"))
    # decode-throughput calibration for mode="auto" (round 5, VERDICT r4
    # item 5): one timed probe per index lifetime — re-finalizes
    # (incremental ticks, compactions) reuse the stored rate
    rate = None
    meta_path = tbl.p(index_dir, "index_meta")
    if tbl.exists(index_dir, "index_meta"):
        prev = spark.read.parquet(meta_path).collect()[0].asDict()
        rate = prev.get("decode_rows_per_sec")
    if not rate:
        avgdl = (
            float(stats["sum_dl"]) / float(stats["n_docs"]) if stats["n_docs"] else 0.0
        )
        rate = _decode_probe(spark, index_dir, cfg, avgdl, int(stats["n_docs"]))
    # persist the build-time config: the index is self-describing, so
    # query-time salt math / partition pruning can never silently drift
    # from the writer's layout (the analog of ES storing its mapping)
    tbl.local_rows_df(
        spark,
        [(
            cfg.k1, cfg.b, cfg.edge_ngram, cfg.edge_ngram_min, cfg.edge_ngram_max,
            cfg.with_positions, cfg.block_size, cfg.n_buckets, cfg.wave_size,
            cfg.salt_docs, cfg.term_buckets,
            json.dumps(list(cfg.synonyms)) if cfg.synonyms else None,
            float(rate) if rate else None,
        )],
        tbl.INDEX_META_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(meta_path)


def _decode_probe(
    spark: SparkSession,
    index_dir: str,
    cfg: IndexConfig,
    avgdl: float,
    n_docs: int,
    cap: int = 16_000_000,
    min_rows: int = 1_000_000,
) -> float | None:
    """Measured posting-decode throughput (postings/sec) of THIS index
    on THIS deployment, for the mode="auto" crossover: threshold ≈ rate
    × latency budget replaces the hand-set 32M default (config.py).

    The probe times the full-decode kernel (block scan → Arrow decode →
    per-posting contribs) over the head terms' postings. When the head
    terms carry more than ``cap`` postings, the decode is restricted to
    a leading within-bucket docid range sized to ~cap rows (block
    start_docid mod bucket capacity — pure math, uniform across
    buckets), so even a 10^12-doc head term costs ~2 s once per index
    lifetime. Indexes whose head terms can't supply ``min_rows``
    postings return None — a measurement dominated by job-scheduling
    overhead would mis-calibrate, and small corpora are exactly where
    the static default is already right (every full decode is
    sub-budget)."""
    from ..operators.docids import bucket_capacity
    from ..operators.query import _decode_contribs, _matching_blocks, term_buckets_of

    if avgdl <= 0 or n_docs <= 0:
        return None
    top = (
        spark.read.parquet(tbl.p(index_dir, "term_dict"))
        .orderBy(F.col("df").desc())
        .limit(32)
        .collect()
    )
    terms, cum = [], 0
    for r in top:
        terms.append(r["term"])
        cum += int(r["df"])
        if cum >= cap:
            break
    if cum < min_rows:
        return None
    buckets = sorted(set(term_buckets_of(spark, terms, cfg.term_buckets).values()))
    blocks = _matching_blocks(spark, index_dir, terms, buckets)
    if cum > cap:
        docs_per_bucket = max(1, n_docs // cfg.n_buckets)
        offset_cap = max(
            int(cfg.salt_docs), int(docs_per_bucket * (cap / cum))
        )
        blocks = blocks.filter(
            F.pmod(F.col("start_docid"), F.lit(bucket_capacity(cfg.n_buckets)))
            < offset_cap
        )
    t0 = time.monotonic()
    n = _decode_contribs(blocks, {t: 1.0 for t in terms}, cfg, avgdl).count()
    dt = time.monotonic() - t0
    if n < min_rows or dt <= 0:
        return None
    return n / dt
