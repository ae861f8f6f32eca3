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
from ..sources import tables as tbl


def set_alias(alias_dir: str, target_dir: str) -> None:
    """Point ``alias_dir`` at ``target_dir`` (create or atomically swap).

    The pointer write is tmp-file + ``os.replace`` (atomic on POSIX), so
    a concurrent reader sees either the old or the new target, never a
    torn file. Driver-side caches (corpus stats, persisted config) keyed
    by the alias path are invalidated so the next query reads the new
    target's metadata. Chained aliases are rejected."""
    target = os.path.abspath(target_dir)
    if os.path.isfile(os.path.join(target, tbl.ALIAS_FILE)):
        raise ValueError("alias chains are not supported; point at a real index")
    if not os.path.isdir(target):
        raise ValueError(f"alias target does not exist: {target}")
    os.makedirs(alias_dir, exist_ok=True)
    tmp = os.path.join(alias_dir, tbl.ALIAS_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(target)
    os.replace(tmp, os.path.join(alias_dir, tbl.ALIAS_FILE))
    invalidate_stats_cache(alias_dir)


def get_alias(alias_dir: str) -> str | None:
    """The alias target, or None if ``alias_dir`` is not an alias."""
    resolved = tbl.resolve(alias_dir)
    return None if resolved == alias_dir else resolved
