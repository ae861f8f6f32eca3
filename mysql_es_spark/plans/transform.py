"""ES Transforms (``_transform``): continuous pivot / latest tables.

ES transforms maintain an entity-centric destination index from a
source index: ``pivot`` (group-by entity + aggregations) or ``latest``
(most recent doc per key), either as a one-shot batch or *continuously*
— each checkpoint detects which buckets changed since the last run (via
the ``sync`` time field) and recomputes ONLY those buckets
(docs.elastic.co: transform checkpoints). The reference's rows land in
ES where transforms are the standard way to roll conversations up to
entity tables; this module is the same contract Spark-first.

Scale design:
- The destination is hash-partitioned on the group key
  (``part = pmod(xxhash64(keys), n_parts)``, a real partition column),
  so an incremental tick rewrites only the partitions that contain a
  changed key — dynamic partition overwrite, work ∝ changed buckets,
  never the whole destination. At 10^12 source rows with a trickle of
  updates a tick touches a handful of files.
- Changed keys come from one pushed-down filter (``sync > watermark``)
  + distinct; the recompute is a left-semi join of the source against
  those keys — a broadcast when small, never a full re-aggregation.
- Crash safety mirrors the index build: data first, checkpoint meta
  last. A replayed tick recomputes the same buckets idempotently.
- The transform is self-describing: config persists in
  ``_transform_meta`` and a later tick with a different config fails
  loudly instead of silently mixing layouts (the same lesson as
  index_meta).

Aggregation expressions are SQL aggregate expressions over the source
columns (ES pivot aggs: avg/sum/min/max/value_count/cardinality/
percentiles/top_metrics → all expressible); they are validated to
actually aggregate (exactly one row per group) at create time.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables as tbl

_META = "_transform_meta"


@dataclass(frozen=True)
class TransformConfig:
    """``pivot``: group_by + aggs (alias → SQL aggregate expression).
    ``latest``: unique_key + sort_field (most recent per key).
    ``sync_field`` orders change detection; ``tiebreak`` makes `latest`
    deterministic under equal sort values."""

    mode: str = "pivot"  # pivot | latest
    group_by: tuple[str, ...] = ()
    aggs: dict[str, str] = field(default_factory=dict)
    unique_key: tuple[str, ...] = ()
    sort_field: str = "ts"
    tiebreak: str | None = None
    sync_field: str = "ts"
    n_parts: int = 16
    # ES transform checkpoint ``delay``: change detection looks back
    # this far behind the stored watermark, so a row that ARRIVES late
    # but carries a sync value at-or-just-before the watermark is still
    # picked up on the next tick. Safe because ticks recompute whole
    # buckets idempotently; the only cost is re-aggregating keys whose
    # rows fall inside the overlap window. 0 keeps strict `>` semantics
    # (a row landing with sync == watermark after the tick is missed —
    # exactly the gap ES documents delay for).
    delay_seconds: float = 0.0

    def keys(self) -> list[str]:
        return list(self.group_by if self.mode == "pivot" else self.unique_key)

    def to_json(self) -> str:
        return json.dumps(
            {
                "mode": self.mode,
                "group_by": list(self.group_by),
                "aggs": dict(self.aggs),
                "unique_key": list(self.unique_key),
                "sort_field": self.sort_field,
                "tiebreak": self.tiebreak,
                "sync_field": self.sync_field,
                "n_parts": self.n_parts,
                "delay_seconds": self.delay_seconds,
            },
            sort_keys=True,
        )

    def validate(self) -> None:
        if self.mode == "pivot":
            if not self.group_by or not self.aggs:
                raise ValueError("pivot transform needs group_by and aggs")
        elif self.mode == "latest":
            if not self.unique_key or not self.sort_field:
                raise ValueError("latest transform needs unique_key and sort_field")
            if self.tiebreak is None:
                raise ValueError(
                    "latest transform needs a tiebreak column for a "
                    "deterministic winner under equal sort values"
                )
        else:
            raise ValueError(f"unknown transform mode {self.mode!r}")


def _part_col(cfg: TransformConfig) -> F.Column:
    return F.pmod(
        F.xxhash64(*[F.col(k) for k in cfg.keys()]), F.lit(cfg.n_parts)
    ).cast("int")


def _recompute(src: DataFrame, cfg: TransformConfig) -> DataFrame:
    """The transform function itself, over whatever slice of the source
    it is given — exactly one output row per key."""
    if cfg.mode == "pivot":
        aggs = [F.expr(e).alias(a) for a, e in sorted(cfg.aggs.items())]
        return src.groupBy(*cfg.group_by).agg(*aggs)
    w_cols = [F.col(cfg.sort_field).desc(), F.col(cfg.tiebreak).desc()]
    from pyspark.sql import Window

    w = Window.partitionBy(*cfg.unique_key).orderBy(*w_cols)
    return (
        src.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _read_meta(spark: SparkSession, dest: str) -> dict | None:
    if not tbl.exists(dest, _META):
        return None
    r = spark.read.parquet(tbl.p(dest, _META)).collect()[0]
    return {"config": r["config"], "watermark": r["watermark"]}


def _write_meta(spark: SparkSession, dest: str, cfg: TransformConfig, wm: str | None) -> None:
    tbl.local_rows_df(
        spark, [(cfg.to_json(), wm)], "config string, watermark string"
    ).coalesce(1).write.mode("overwrite").parquet(tbl.p(dest, _META))


def _max_sync(df: DataFrame, cfg: TransformConfig) -> str | None:
    # the watermark is stored as a string and cast back to the sync
    # column's OWN type for comparison — works for TIMESTAMP and
    # TIMESTAMP_NTZ alike (ANSI forbids numeric casts of NTZ, and
    # mixing the two timestamp families in one expression)
    r = df.agg(F.max(F.col(cfg.sync_field)).cast("string")).collect()[0][0]
    return r


def _sync_after(df: DataFrame, cfg: TransformConfig, wm: str) -> DataFrame:
    from pyspark.sql.types import TimestampNTZType, TimestampType

    t = df.schema[cfg.sync_field].dataType
    bound = F.lit(wm).cast(t)
    if cfg.delay_seconds:
        # look-back window (ES checkpoint `delay`): rows with sync in
        # (wm - delay, wm] re-detect on later ticks — idempotent, the
        # bucket recompute makes replays free of double counting
        if isinstance(t, (TimestampType, TimestampNTZType)):
            bound = bound - F.expr(f"make_dt_interval(0, 0, 0, {cfg.delay_seconds})")
        else:
            bound = bound - F.lit(cfg.delay_seconds).cast(t)
    return df.filter(F.col(cfg.sync_field) > bound)


def run_transform(spark: SparkSession, src: DataFrame, dest: str, cfg: TransformConfig) -> dict:
    """One-shot (or first) run: full recompute, full write, checkpoint.
    Non-aggregating pivot expressions fail analysis loudly (groupBy.agg
    rejects them) before anything is written."""
    cfg.validate()
    meta = _read_meta(spark, dest)
    if meta is not None and meta["config"] != cfg.to_json():
        raise ValueError(
            "transform destination was created with a different config; "
            "refusing to mix layouts (delete the destination to recreate)"
        )
    out = _recompute(src, cfg).withColumn("part", _part_col(cfg))
    out.write.mode("overwrite").partitionBy("part").parquet(tbl.p(dest, "table"))
    wm = _max_sync(src, cfg)
    _write_meta(spark, dest, cfg, wm)
    return {"mode": "full", "watermark": wm}


def tick_transform(spark: SparkSession, src: DataFrame, dest: str, cfg: TransformConfig) -> dict:
    """Incremental checkpoint: recompute only buckets whose key saw a
    source row with ``sync_field`` past the stored watermark, rewrite
    only destination partitions containing such keys. Idempotent —
    replaying a crashed tick recomputes the same buckets; meta (the
    watermark) commits last."""
    cfg.validate()
    meta = _read_meta(spark, dest)
    if meta is None:
        return run_transform(spark, src, dest, cfg)
    if meta["config"] != cfg.to_json():
        raise ValueError(
            "transform config drifted from the destination's persisted "
            "config; refusing to tick"
        )
    wm = meta["watermark"]
    changed = _sync_after(src, cfg, wm) if wm is not None else src
    keys = changed.select(*cfg.keys()).distinct()
    n_changed = keys.count()
    if n_changed == 0:
        return {"mode": "noop", "watermark": wm, "changed_keys": 0}
    # recompute changed buckets from the full source (ES semantics: the
    # destination row reflects ALL source docs for that key, not a delta)
    slice_ = src.join(F.broadcast(keys) if n_changed <= 100_000 else keys, cfg.keys(), "left_semi")
    fresh = _recompute(slice_, cfg).withColumn("part", _part_col(cfg))
    parts = [int(r["part"]) for r in fresh.select("part").distinct().collect()]
    # keep unaffected keys that share a rewritten partition. The write
    # below overwrites the very partition files this keep-set reads, so
    # stage it first (bounded: affected partitions only — the same
    # read-then-overwrite staging plans/deletes.update_by_query uses;
    # Iceberg snapshot isolation would make this unnecessary).
    import shutil as _shutil

    staged_path = tbl.p(dest, "keep-snapshot.tmp")
    existing = spark.read.parquet(tbl.p(dest, "table"))
    (
        existing.filter(F.col("part").isin(parts))
        .join(keys, cfg.keys(), "left_anti")
        .write.mode("overwrite")
        .parquet(staged_path)
    )
    try:
        # explicit schema: a zero-row staging write leaves no data files
        keep = spark.read.schema(existing.schema).parquet(staged_path)
        out = keep.unionByName(fresh.select(*keep.columns))
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("part")
            .parquet(tbl.p(dest, "table"))
        )
    finally:
        _shutil.rmtree(staged_path, ignore_errors=True)
    new_wm = _max_sync(changed, cfg) or wm
    _write_meta(spark, dest, cfg, new_wm)
    return {
        "mode": "incremental",
        "watermark": new_wm,
        "changed_keys": n_changed,
        "parts_rewritten": len(parts),
    }


def read_transform(spark: SparkSession, dest: str) -> DataFrame:
    """The destination entity table (partition column dropped)."""
    return spark.read.parquet(tbl.p(dest, "table")).drop("part")
