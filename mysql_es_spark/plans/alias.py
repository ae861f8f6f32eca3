"""Index aliases — ES's zero-downtime swap, for this layout.

The reference swaps ES aliases so readers never see a half-built index
(its reindex flow: build ``idx_v2``, then atomically repoint the alias).
Compaction (plans/compact.py) and reindex (plans/deletes.py) follow the
same build-aside pattern here — they write a NEW directory — and this
module supplies the pointer swap: an alias is a directory containing a
single ``_ALIAS`` file whose content is the real index path. Every table
access goes through ``sources.tables.p()``, which follows the pointer,
so a swap is one atomic rename away and in-flight queries keep reading
the old target (their resolved paths are already bound into the plan).
"""

from __future__ import annotations

import os

from ..operators.query import invalidate_stats_cache
from ..sources import fsio
from ..sources import tables as tbl


def set_alias(alias_dir: str, target_dir: str, doc_filter: str | None = None) -> None:
    """Point ``alias_dir`` at ``target_dir`` (create or atomically swap).

    The pointer write is tmp-file + ``os.replace`` (atomic on POSIX), so
    a concurrent reader sees either the old or the new target, never a
    torn file. Driver-side caches (corpus stats, persisted config) keyed
    by the alias path are invalidated so the next query reads the new
    target's metadata. Chained aliases are rejected.

    ``doc_filter`` makes it a FILTERED alias (ES alias ``filter``): a SQL
    predicate over the forward columns (e.g. ``"role = 'en'"``) that the
    core search surfaces — bm25_topk, match_count, match_export — apply
    in filter context (non-scoring mask; idf/avgdl stay corpus-global,
    exactly ES's filtered-alias behavior). Newlines are rejected (the
    pointer file is line-oriented).

    Both ``alias_dir`` and ``target_dir`` may be ``scheme://`` paths —
    the pointer write goes through the fsio backend (atomic on either),
    so aliases work on object storage end to end (round 5)."""
    target = fsio.absolute(target_dir)
    if fsio.isfile(fsio.join(target, tbl.ALIAS_FILE)):
        raise ValueError("alias chains are not supported; point at a real index")
    if not fsio.isdir(target):
        raise ValueError(f"alias target does not exist: {target}")
    if doc_filter is not None and ("\n" in doc_filter or not doc_filter.strip()):
        raise ValueError("doc_filter must be a non-empty single-line SQL predicate")
    fsio.makedirs(alias_dir)
    fsio.write_text(
        fsio.join(alias_dir, tbl.ALIAS_FILE),
        target if doc_filter is None else f"{target}\n{doc_filter.strip()}",
    )
    invalidate_stats_cache(alias_dir)


def get_alias(alias_dir: str) -> str | None:
    """The alias target, or None if ``alias_dir`` is not an alias."""
    resolved = tbl.resolve(alias_dir)
    return None if resolved == alias_dir else resolved


def rollover(
    spark,
    alias_dir: str,
    cfg=None,
    max_docs: int | None = None,
    max_bytes: int | None = None,
) -> dict:
    """ES ``_rollover``: when the alias's current write index exceeds a
    condition, create the next generation and atomically repoint the
    alias — the standard way to bound per-index size under a continuous
    ingest stream (here: the CDC/incremental path writes to whatever the
    alias resolves to, so after rollover new batches land in the fresh
    generation; older generations stay queryable by their real paths or
    the date-routed/dfs multi-index search).

    Generation naming is ES's: ``<alias>-NNNNNN`` siblings of the alias
    directory. The condition check is metadata-only (corpus_stats row +
    a directory size walk — no table scan). Returns
    {rolled, old_index, new_index, n_docs, bytes}.
    """
    import re

    from pyspark.sql import functions as F  # noqa: F401 (parity with module imports)

    from ..config import IndexConfig
    from ..corpus import TRANSCRIPT_SCHEMA
    from .build import build_index

    target = get_alias(alias_dir)
    if target is None:
        raise ValueError(f"{alias_dir} is not an alias (rollover needs one)")
    if max_docs is None and max_bytes is None:
        raise ValueError("rollover needs at least one condition (max_docs/max_bytes)")

    n_docs = int(
        spark.read.parquet(os.path.join(target, "corpus_stats")).collect()[0]["n_docs"]
    )
    n_bytes = sum(sz for _f, sz in fsio.fs_for(target).walk_files(target))
    hit = (max_docs is not None and n_docs >= max_docs) or (
        max_bytes is not None and n_bytes >= max_bytes
    )
    out = {
        "rolled": False, "old_index": target, "new_index": None,
        "n_docs": n_docs, "bytes": n_bytes,
    }
    if not hit:
        return out

    base = os.path.basename(os.path.normpath(alias_dir))
    parent = os.path.dirname(fsio.absolute(alias_dir))
    # monotonic over ALL generations (ES's generation counter): a merged
    # generation may carry a higher number than the current write index
    nums = [1]
    m = re.match(rf"^{re.escape(parent + '/' + base)}-(\d{{6}})$", target)
    if m:
        nums.append(int(m.group(1)) + 1)
    for label in list_generations(alias_dir):
        mm = re.match(rf"^{re.escape(base)}-(\d{{6}})$", label)
        if mm:
            nums.append(int(mm.group(1)) + 1)
    gen = max(nums)
    new_dir = f"{parent}/{base}-{gen:06d}"
    if fsio.exists(new_dir):
        raise ValueError(f"rollover target already exists: {new_dir}")
    # an empty index with the OLD generation's physical config (unless
    # overridden): build handles zero-doc buckets by design
    if cfg is None:
        from ..operators.query import effective_config

        cfg = effective_config(spark, target, None)
    empty = spark.createDataFrame([], TRANSCRIPT_SCHEMA)
    build_index(spark, empty, new_dir, cfg)
    set_alias(alias_dir, new_dir)
    out.update(rolled=True, new_index=new_dir)
    return out


def list_generations(alias_dir: str) -> dict[str, str]:
    """Every rollover generation of this alias (label → dir), current
    target included — the member set a multi-index search addresses
    (plans/multi_index.py), like an ES alias spanning rolled indices."""
    import re

    base = os.path.basename(os.path.normpath(alias_dir))
    parent = os.path.dirname(fsio.absolute(alias_dir))
    pat = re.compile(rf"^{re.escape(base)}-\d{{6}}$")
    out = {}
    for d in sorted(fsio.listdir(parent)):
        if pat.match(d) and fsio.isdir(f"{parent}/{d}"):
            out[d] = f"{parent}/{d}"
    target = get_alias(alias_dir)
    if target is not None:
        out.setdefault(os.path.basename(os.path.normpath(target)), target)
    return out


def search_generations(spark, alias_dir: str, query: str, k: int = 10, cfg=None):
    """Global-stats BM25 over every generation of the alias — rank-
    identical to one index holding all generations' docs (the rollover
    story's read side: write to the newest, search them all)."""
    from .multi_index import bm25_topk_across

    return bm25_topk_across(spark, list_generations(alias_dir), query, k=k, cfg=cfg)


def resolve_name(path: str) -> dict:
    """ES ``_resolve/index``: what IS this path — a concrete index, an
    alias (filtered?), a data stream (alias with rollover generations),
    or nothing. One directory stat + pointer read; no SparkSession.

    Returns {"type": "index"|"alias"|"data_stream"|"missing",
    "target": resolved index dir or None, "generations": [labels],
    "filtered": bool}."""
    from ..sources import tables as tbl

    if not fsio.isdir(path):
        return {"type": "missing", "target": None, "generations": [], "filtered": False}
    target = get_alias(path)
    if target is None:
        kind = "index" if tbl.exists(path, "corpus_stats") else "missing"
        return {"type": kind, "target": fsio.absolute(path) if kind == "index" else None,
                "generations": [], "filtered": False}
    import re

    gens = sorted(list_generations(path))
    filtered = tbl.alias_filter(path) is not None
    # a data stream's write index follows the <name>-NNNNNN generation
    # naming; a plain alias points anywhere
    base = os.path.basename(os.path.normpath(path))
    is_gen_target = re.match(
        rf"^{re.escape(base)}-\d{{6}}$", os.path.basename(os.path.normpath(target))
    )
    kind = "data_stream" if is_gen_target and not filtered else "alias"
    return {
        "type": kind,
        "target": fsio.absolute(target),
        "generations": gens,
        "filtered": filtered,
    }
