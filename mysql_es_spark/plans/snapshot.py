"""Snapshot / restore — ES ``_snapshot`` repositories, for this layout.

ES snapshots an index into a repository *incrementally*: segment files
are content-addressed blobs, and a new snapshot re-uploads only files
not already present, so daily snapshots of a slowly-changing index cost
only the delta (the reference deployment relies on this for its ES
cluster's backups). This module is the same contract for the parquet
index tree:

    repo/
      blobs/<md5 of content>          one blob per unique file content
      snapshots/<name>.json           manifest: relpath -> (blob, size)

``create_snapshot`` walks the index directory, hashes each file, copies
only blobs the repo lacks, then writes the manifest ATOMICALLY LAST
(tmp + os.replace) — a crashed snapshot leaves unreferenced blobs, never
a manifest pointing at missing data (the same commit-after-data ordering
as the build's lineage). ``restore_snapshot`` materializes the tree into
a fresh directory; queries over the restored index are byte-identical.

Scale note: on a real deployment the blob pool is an object store and
the per-file copy is a distributed PUT keyed by etag (what ES does);
driver-side file I/O here is the local-FS stand-in for that — snapshot
is operational tooling, never on the query or build data path.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


def _file_md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _manifest_path(repo_dir: str, name: str) -> str:
    return os.path.join(repo_dir, "snapshots", f"{name}.json")


def create_snapshot(index_dir: str, repo_dir: str, name: str) -> dict:
    """Snapshot ``index_dir`` into ``repo_dir`` as ``name``.

    Returns {files, bytes, blobs_added} — ``blobs_added`` is the
    incremental cost: 0 for a re-snapshot of an unchanged index.
    """
    from ..sources import tables as tbl

    # aliases resolve like every other index_dir entry point: snapshot
    # the TARGET's data, not the one-line pointer file
    index_dir = tbl.resolve(index_dir)
    if not os.path.isdir(index_dir):
        raise ValueError(f"no such index: {index_dir}")
    if os.path.exists(_manifest_path(repo_dir, name)):
        raise ValueError(f"snapshot {name!r} already exists in {repo_dir}")
    blob_dir = os.path.join(repo_dir, "blobs")
    os.makedirs(blob_dir, exist_ok=True)
    os.makedirs(os.path.join(repo_dir, "snapshots"), exist_ok=True)

    manifest: dict[str, dict] = {}
    n_bytes = added = 0
    for root, _dirs, files in os.walk(index_dir):
        for fn in files:
            src = os.path.join(root, fn)
            rel = os.path.relpath(src, index_dir)
            digest = _file_md5(src)
            blob = os.path.join(blob_dir, digest)
            if not os.path.exists(blob):
                # copy-then-rename so a crash never leaves a short blob
                tmp = blob + ".tmp"
                shutil.copyfile(src, tmp)
                os.replace(tmp, blob)
                added += 1
            size = os.path.getsize(src)
            n_bytes += size
            manifest[rel] = {"blob": digest, "size": size}

    tmp = _manifest_path(repo_dir, name) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"name": name, "files": manifest}, f)
    os.replace(tmp, _manifest_path(repo_dir, name))
    return {"files": len(manifest), "bytes": n_bytes, "blobs_added": added}


def list_snapshots(repo_dir: str) -> list[dict]:
    snap_dir = os.path.join(repo_dir, "snapshots")
    if not os.path.isdir(snap_dir):
        return []
    out = []
    for fn in sorted(os.listdir(snap_dir)):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(snap_dir, fn)) as f:
            m = json.load(f)
        out.append(
            {
                "name": m["name"],
                "files": len(m["files"]),
                "bytes": sum(v["size"] for v in m["files"].values()),
            }
        )
    return out


def restore_snapshot(repo_dir: str, name: str, dest_dir: str) -> dict:
    """Materialize snapshot ``name`` into ``dest_dir`` (must not exist —
    restore-aside + alias swap is the zero-downtime path, plans/alias.py)."""
    mp = _manifest_path(repo_dir, name)
    if not os.path.exists(mp):
        raise ValueError(f"no snapshot {name!r} in {repo_dir}")
    if os.path.exists(dest_dir):
        raise ValueError(f"restore target already exists: {dest_dir}")
    with open(mp) as f:
        m = json.load(f)
    blob_dir = os.path.join(repo_dir, "blobs")
    n_bytes = 0
    for rel, info in m["files"].items():
        blob = os.path.join(blob_dir, info["blob"])
        if not os.path.exists(blob):
            raise ValueError(f"snapshot {name!r} is corrupt: missing blob for {rel}")
        dst = os.path.join(dest_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(blob, dst)
        n_bytes += info["size"]
    return {"files": len(m["files"]), "bytes": n_bytes}


def gc_blobs(repo_dir: str) -> dict:
    """Remove blobs referenced by NO manifest (the repo-level GC ES runs
    after snapshot deletion). Safe at any time: an interrupted snapshot's
    orphan blobs are exactly what this reclaims."""
    snap_dir = os.path.join(repo_dir, "snapshots")
    blob_dir = os.path.join(repo_dir, "blobs")
    referenced: set[str] = set()
    if os.path.isdir(snap_dir):
        for fn in os.listdir(snap_dir):
            if fn.endswith(".json"):
                with open(os.path.join(snap_dir, fn)) as f:
                    m = json.load(f)
                referenced.update(v["blob"] for v in m["files"].values())
    removed = reclaimed = 0
    if os.path.isdir(blob_dir):
        for b in os.listdir(blob_dir):
            if b not in referenced:
                p = os.path.join(blob_dir, b)
                reclaimed += os.path.getsize(p)
                os.remove(p)
                removed += 1
    return {"blobs_removed": removed, "bytes_reclaimed": reclaimed}


def delete_snapshot(repo_dir: str, name: str) -> dict:
    """ES ``DELETE _snapshot/<repo>/<name>``: drop the manifest, then GC
    blobs no remaining snapshot references. Manifest removal commits
    first — a crash mid-GC leaves only unreferenced blobs (reclaimable by
    a later :func:`gc_blobs`), never a manifest pointing at missing data."""
    mp = _manifest_path(repo_dir, name)
    if not os.path.exists(mp):
        raise ValueError(f"no snapshot {name!r} in {repo_dir}")
    os.remove(mp)
    return {"deleted": name, **gc_blobs(repo_dir)}


def prune_snapshots(repo_dir: str, keep_last: int) -> dict:
    """SLM-style retention: keep the ``keep_last`` newest snapshots (by
    name order — the date-stamped naming convention SLM uses), delete the
    rest, GC once. Returns {deleted: [...], blobs_removed, bytes_reclaimed}."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    names = [s["name"] for s in list_snapshots(repo_dir)]
    victims = names[:-keep_last] if len(names) > keep_last else []
    for name in victims:
        os.remove(_manifest_path(repo_dir, name))
    out = gc_blobs(repo_dir)
    return {"deleted": victims, **out}


def verify_repo(repo_dir: str, deep: bool = False) -> dict:
    """ES ``_snapshot/.../_verify`` + repository integrity analysis: every
    manifest's blobs must exist with the recorded size; with ``deep``,
    each referenced blob is re-hashed and must equal its content-address
    (bit-rot check — the blob NAME is its md5, so corruption is
    self-evident). Also counts unreferenced blobs (crash leftovers /
    prune candidates — harmless by the commit-after-data ordering).

    Returns {snapshots, blobs, unreferenced, missing, size_mismatch,
    corrupt, ok}. Never raises on findings — the caller decides; a
    missing/corrupt count > 0 means the named snapshots cannot restore.
    """
    blob_dir = os.path.join(repo_dir, "blobs")
    snap_dir = os.path.join(repo_dir, "snapshots")
    missing: list[str] = []
    size_mismatch: list[str] = []
    corrupt: list[str] = []
    referenced: set[str] = set()
    names = []
    if os.path.isdir(snap_dir):
        names = sorted(f[:-5] for f in os.listdir(snap_dir) if f.endswith(".json"))
    for name in names:
        with open(_manifest_path(repo_dir, name)) as f:
            man = json.load(f)["files"]
        for rel, meta in man.items():
            digest = meta["blob"]
            referenced.add(digest)
            blob = os.path.join(blob_dir, digest)
            if not os.path.exists(blob):
                missing.append(f"{name}:{rel}")
                continue
            if os.path.getsize(blob) != meta["size"]:
                size_mismatch.append(f"{name}:{rel}")
            elif deep and _file_md5(blob) != digest:
                corrupt.append(f"{name}:{rel}")
    all_blobs = set(os.listdir(blob_dir)) if os.path.isdir(blob_dir) else set()
    all_blobs = {b for b in all_blobs if not b.endswith(".tmp")}
    return {
        "snapshots": len(names),
        "blobs": len(all_blobs),
        "unreferenced": len(all_blobs - referenced),
        "missing": missing,
        "size_mismatch": size_mismatch,
        "corrupt": corrupt,
        "ok": not (missing or size_mismatch or corrupt),
    }
