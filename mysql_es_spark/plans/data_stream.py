"""ES data streams: an append-only named stream over backing indexes.

A data stream gives ingest a single name while the storage underneath
is a series of immutable backing indexes (``.ds-<name>-NNNNNN``):
writes land in the newest generation, searches span all of them,
retention drops whole generations by age (docs.elastic.co data
streams; the reference's continuously-synced rows are exactly this
append-mostly shape).

Spark-first mapping, reusing the proven pieces:
- a generation IS one built index (immutable segment set, rollover
  naming from plans/alias.py);
- ``append_batch`` builds the NEXT generation from the batch alone —
  O(batch) work, no rewrite of history, the same economics as a Lucene
  flush; the alias repoints atomically, so a crashed append leaves the
  stream readable at the previous generation;
- reads are the existing global-stats multi-index search
  (search_generations → dfs_query_then_fetch), rank-identical to one
  monolithic index over all generations' docs — already soak-proven;
- ``expire_generations`` is retention: a generation whose newest doc is
  older than the cutoff is deleted whole (one directory remove, the
  whole point of time-bucketed backing indexes). The current write
  index is never deleted.

Many small appends → many small generations; per-generation
``plans/compact.py`` forcemerge keeps each one optimal, and ILM
(plans/ilm.py) automates the rollover→forcemerge→delete ladder on top
of exactly these primitives.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from .alias import get_alias, list_generations, search_generations, set_alias


def _gen_dir(ds_dir: str, gen: int) -> str:
    base = os.path.basename(os.path.normpath(ds_dir))
    return os.path.join(os.path.dirname(os.path.abspath(ds_dir)), f"{base}-{gen:06d}")


def _current_gen(ds_dir: str) -> int:
    target = get_alias(ds_dir)
    if target is None:
        raise ValueError(f"{ds_dir} is not a data stream (no alias)")
    m = re.search(r"-(\d{6})$", os.path.normpath(target))
    if not m:
        raise ValueError(f"{ds_dir}: write index {target!r} is not a generation")
    return int(m.group(1))


def create_data_stream(
    spark: SparkSession, ds_dir: str, cfg: IndexConfig | None = None
) -> dict:
    """Create the stream: an empty first generation + the alias. The
    config persists in the generation (self-describing) and later
    generations inherit it unless overridden per append."""
    from ..corpus import TRANSCRIPT_SCHEMA
    from .build import build_index

    if get_alias(ds_dir) is not None:
        raise ValueError(f"data stream already exists at {ds_dir}")
    gen1 = _gen_dir(ds_dir, 1)
    build_index(spark, spark.createDataFrame([], TRANSCRIPT_SCHEMA), gen1, cfg or IndexConfig())
    set_alias(ds_dir, gen1)
    return {"created": gen1}


def append_batch(
    spark: SparkSession, ds_dir: str, batch: DataFrame, cfg: IndexConfig | None = None
) -> dict:
    """Append a batch as the next generation and repoint the alias.
    Work is O(batch): one index build over the new docs only — history
    is never rewritten. Alias swap last, so a crash mid-build leaves the
    stream intact at the previous generation.

    The new generation number is monotonic over ALL existing
    generations (same rule as alias.rollover), not write-index+1: a
    forcemerge leaves a merged generation numbered above the current
    write index, and numbering off the write index alone would collide
    with it and wedge ingest."""
    from ..operators.query import effective_config
    from .build import build_index

    _current_gen(ds_dir)  # validates this is a data stream
    base = os.path.basename(os.path.normpath(ds_dir))
    nums = [int(m.group(1)) for m in
            (re.match(rf"^{re.escape(base)}-(\d{{6}})$", lbl)
             for lbl in list_generations(ds_dir)) if m]
    if cfg is None:
        cfg = effective_config(spark, get_alias(ds_dir), None)
    new_dir = _gen_dir(ds_dir, max(nums, default=0) + 1)
    if os.path.exists(new_dir):
        raise ValueError(f"generation already exists: {new_dir}")
    stats = build_index(spark, batch, new_dir, cfg)
    set_alias(ds_dir, new_dir)
    return {"generation": new_dir, "build": stats}


def _complete_generations(ds_dir: str) -> dict[str, str]:
    """Generations whose build committed (corpus_stats exists — the
    build's last data table). A crashed append leaves a half-built dir;
    searches and retention must treat it as absent, exactly as ES treats
    an index missing from cluster state. Generations swallowed by a
    forcemerge (listed in a merged generation's ``_swallowed`` file) are
    likewise excluded the instant the merged generation commits, so the
    merge never needs an atomic multi-directory swap — deleting the old
    dirs is pure garbage collection."""
    import json

    from ..sources import tables as tbl

    out = {
        lbl: d
        for lbl, d in list_generations(ds_dir).items()
        if tbl.exists(d, "corpus_stats")
    }
    swallowed: set[str] = set()
    for d in out.values():
        p = os.path.join(d, "_swallowed.json")
        if os.path.exists(p):
            with open(p) as f:
                swallowed.update(json.load(f))
    return {lbl: d for lbl, d in out.items() if lbl not in swallowed}


def search_stream(spark: SparkSession, ds_dir: str, query: str, k: int = 10, cfg=None):
    """Global-stats BM25 across every COMMITTED generation — rank-
    identical to one monolithic index over all the stream's docs."""
    from .multi_index import bm25_topk_across

    return bm25_topk_across(spark, _complete_generations(ds_dir), query, k=k, cfg=cfg)


def expire_generations(
    spark: SparkSession, ds_dir: str, older_than: str, ts_col: str = "ts"
) -> list[str]:
    """Retention: delete every generation whose NEWEST doc is older than
    ``older_than`` (a timestamp string in the column's own cast space).
    Whole-directory removal — the economics that justify time-bucketed
    backing indexes. The current write index survives regardless."""
    target = os.path.normpath(get_alias(ds_dir) or "")
    dropped = []
    for _label, d in sorted(_complete_generations(ds_dir).items()):
        if os.path.normpath(d) == target:
            continue
        fwd = spark.read.parquet(os.path.join(d, "forward")).select(ts_col)
        mx = fwd.agg(F.max(ts_col).cast("string")).collect()[0][0]
        if mx is not None and not mx < older_than:
            continue
        # mx is None (empty generation) or strictly older → expire
        shutil.rmtree(d)
        dropped.append(d)
    return dropped


def forcemerge_stream(
    spark: SparkSession, ds_dir: str, on_dup: str = "error"
) -> dict:
    """Merge every committed NON-write generation into one optimized
    generation (plans/compact.merge_indexes — decode → docid remap →
    re-encode, no re-tokenize), rank-preserving under global-stats
    search.

    Crash-safe without an atomic multi-dir swap: the merged generation
    is built under a name the generation pattern doesn't match, gains a
    ``_swallowed.json`` naming its victims, and only then renames into
    place — the moment it commits, readers exclude the swallowed dirs
    (cluster-state style), so deleting them afterwards is garbage
    collection. A crash before the rename leaves the stream exactly as
    it was; after it, duplicates are impossible and leftovers are
    removed by the next call."""
    import json

    from ..operators.query import effective_config
    from .compact import merge_indexes

    write_ix = os.path.normpath(get_alias(ds_dir) or "")
    gens = _complete_generations(ds_dir)
    victims = {
        lbl: d for lbl, d in gens.items() if os.path.normpath(d) != write_ix
    }
    # GC any stragglers from a previous crash (swallowed but not deleted)
    import re as _re

    base = os.path.basename(os.path.normpath(ds_dir))
    parent = os.path.dirname(os.path.abspath(ds_dir))
    live = set(gens)
    for d in os.listdir(parent):
        if _re.match(rf"^{_re.escape(base)}-\d{{6}}$", d) and d not in live:
            full = os.path.join(parent, d)
            if os.path.normpath(full) != write_ix and os.path.isdir(full):
                from ..sources import tables as tbl

                if tbl.exists(full, "corpus_stats"):
                    shutil.rmtree(full)  # swallowed leftover
    if len(victims) < 2:
        return {"merged": 0, "generations": sorted(victims)}

    nums = [int(m.group(1)) for m in
            (_re.match(rf"^{_re.escape(base)}-(\d{{6}})$", lbl)
             for lbl in list_generations(ds_dir)) if m]
    new_label = f"{base}-{max(nums) + 1:06d}"
    tmp = os.path.join(parent, f"{base}.merging")
    shutil.rmtree(tmp, ignore_errors=True)
    info = merge_indexes(
        spark, [victims[lbl] for lbl in sorted(victims)], tmp,
        cfg=effective_config(spark, write_ix, None), on_dup=on_dup,
    )
    with open(os.path.join(tmp, "_swallowed.json"), "w") as f:
        json.dump(sorted(victims), f)
    os.rename(tmp, os.path.join(parent, new_label))  # commit point
    for d in victims.values():
        shutil.rmtree(d)  # GC
    return {"merged": len(victims), "new_generation": new_label, **info}
