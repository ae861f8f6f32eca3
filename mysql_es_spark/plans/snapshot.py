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
(tmp + rename) — a crashed snapshot leaves unreferenced blobs, never a
manifest pointing at missing data (the same commit-after-data ordering
as the build's lineage). ``restore_snapshot`` materializes the tree into
a fresh directory; queries over the restored index are byte-identical.

All filesystem access routes through :mod:`..sources.fsio`, so both the
index and the repository may live on any Hadoop filesystem (s3a://,
hdfs://, …) — exactly ES's blob-store repository contract. Index and
repo may be on *different* filesystems (local index → object-store
repo); blob bytes stream through the driver, which is the right cost
model for operational tooling off the data path.
"""

from __future__ import annotations

import hashlib
import json

from ..sources import fsio


def _file_md5(fs, path: str) -> str:
    h = hashlib.md5()
    for chunk in fs.read_chunks(path):
        h.update(chunk)
    return h.hexdigest()


def _manifest_path(repo_dir: str, name: str) -> str:
    return fsio.join(repo_dir, "snapshots", f"{name}.json")


def create_snapshot(index_dir: str, repo_dir: str, name: str) -> dict:
    """Snapshot ``index_dir`` into ``repo_dir`` as ``name``.

    Returns {files, bytes, blobs_added} — ``blobs_added`` is the
    incremental cost: 0 for a re-snapshot of an unchanged index.
    """
    from ..sources import tables as tbl

    # aliases resolve like every other index_dir entry point: snapshot
    # the TARGET's data, not the one-line pointer file
    index_dir = tbl.resolve(index_dir)
    ifs, rfs = fsio.fs_for(index_dir), fsio.fs_for(repo_dir)
    if not ifs.isdir(index_dir):
        raise ValueError(f"no such index: {index_dir}")
    if rfs.exists(_manifest_path(repo_dir, name)):
        raise ValueError(f"snapshot {name!r} already exists in {repo_dir}")
    blob_dir = fsio.join(repo_dir, "blobs")
    rfs.makedirs(blob_dir)
    rfs.makedirs(fsio.join(repo_dir, "snapshots"))

    manifest: dict[str, dict] = {}
    n_bytes = added = 0
    for src, size in ifs.walk_files(index_dir):
        rel = fsio.relpath(src, index_dir, ifs)
        digest = _file_md5(ifs, src)
        blob = fsio.join(blob_dir, digest)
        if not rfs.exists(blob):
            # write-then-rename so a crash never leaves a short blob
            fsio.copy_between(ifs, src, rfs, blob)
            added += 1
        n_bytes += size
        manifest[rel] = {"blob": digest, "size": size}

    rfs.write_atomic(
        _manifest_path(repo_dir, name),
        json.dumps({"name": name, "files": manifest}).encode(),
    )
    return {"files": len(manifest), "bytes": n_bytes, "blobs_added": added}


def list_snapshots(repo_dir: str) -> list[dict]:
    rfs = fsio.fs_for(repo_dir)
    snap_dir = fsio.join(repo_dir, "snapshots")
    if not rfs.isdir(snap_dir):
        return []
    out = []
    for fn in sorted(rfs.listdir(snap_dir)):
        if not fn.endswith(".json"):
            continue
        m = json.loads(rfs.read_all(fsio.join(snap_dir, fn)))
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
    rfs, dfs = fsio.fs_for(repo_dir), fsio.fs_for(dest_dir)
    mp = _manifest_path(repo_dir, name)
    if not rfs.exists(mp):
        raise ValueError(f"no snapshot {name!r} in {repo_dir}")
    if dfs.exists(dest_dir):
        raise ValueError(f"restore target already exists: {dest_dir}")
    m = json.loads(rfs.read_all(mp))
    blob_dir = fsio.join(repo_dir, "blobs")
    n_bytes = 0
    for rel, info in m["files"].items():
        blob = fsio.join(blob_dir, info["blob"])
        if not rfs.exists(blob):
            raise ValueError(f"snapshot {name!r} is corrupt: missing blob for {rel}")
        dst = fsio.join(dest_dir, rel)
        parent = dst.rsplit("/", 1)[0]
        dfs.makedirs(parent)
        fsio.copy_between(rfs, blob, dfs, dst)
        n_bytes += info["size"]
    return {"files": len(m["files"]), "bytes": n_bytes}


def gc_blobs(repo_dir: str) -> dict:
    """Remove blobs referenced by NO manifest (the repo-level GC ES runs
    after snapshot deletion). Safe at any time: an interrupted snapshot's
    orphan blobs are exactly what this reclaims."""
    rfs = fsio.fs_for(repo_dir)
    snap_dir = fsio.join(repo_dir, "snapshots")
    blob_dir = fsio.join(repo_dir, "blobs")
    referenced: set[str] = set()
    if rfs.isdir(snap_dir):
        for fn in rfs.listdir(snap_dir):
            if fn.endswith(".json"):
                m = json.loads(rfs.read_all(fsio.join(snap_dir, fn)))
                referenced.update(v["blob"] for v in m["files"].values())
    removed = reclaimed = 0
    if rfs.isdir(blob_dir):
        for b in rfs.listdir(blob_dir):
            if b not in referenced:
                p = fsio.join(blob_dir, b)
                reclaimed += rfs.getsize(p)
                rfs.remove(p)
                removed += 1
    return {"blobs_removed": removed, "bytes_reclaimed": reclaimed}


def delete_snapshot(repo_dir: str, name: str) -> dict:
    """ES ``DELETE _snapshot/<repo>/<name>``: drop the manifest, then GC
    blobs no remaining snapshot references. Manifest removal commits
    first — a crash mid-GC leaves only unreferenced blobs (reclaimable by
    a later :func:`gc_blobs`), never a manifest pointing at missing data."""
    rfs = fsio.fs_for(repo_dir)
    mp = _manifest_path(repo_dir, name)
    if not rfs.exists(mp):
        raise ValueError(f"no snapshot {name!r} in {repo_dir}")
    rfs.remove(mp)
    return {"deleted": name, **gc_blobs(repo_dir)}


def prune_snapshots(repo_dir: str, keep_last: int) -> dict:
    """SLM-style retention: keep the ``keep_last`` newest snapshots (by
    name order — the date-stamped naming convention SLM uses), delete the
    rest, GC once. Returns {deleted: [...], blobs_removed, bytes_reclaimed}."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    rfs = fsio.fs_for(repo_dir)
    names = [s["name"] for s in list_snapshots(repo_dir)]
    victims = names[:-keep_last] if len(names) > keep_last else []
    for name in victims:
        rfs.remove(_manifest_path(repo_dir, name))
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
    rfs = fsio.fs_for(repo_dir)
    blob_dir = fsio.join(repo_dir, "blobs")
    snap_dir = fsio.join(repo_dir, "snapshots")
    missing: list[str] = []
    size_mismatch: list[str] = []
    corrupt: list[str] = []
    referenced: set[str] = set()
    names = []
    if rfs.isdir(snap_dir):
        names = sorted(f[:-5] for f in rfs.listdir(snap_dir) if f.endswith(".json"))
    for name in names:
        man = json.loads(rfs.read_all(_manifest_path(repo_dir, name)))["files"]
        for rel, meta in man.items():
            digest = meta["blob"]
            referenced.add(digest)
            blob = fsio.join(blob_dir, digest)
            if not rfs.exists(blob):
                missing.append(f"{name}:{rel}")
                continue
            if rfs.getsize(blob) != meta["size"]:
                size_mismatch.append(f"{name}:{rel}")
            elif deep and _file_md5(rfs, blob) != digest:
                corrupt.append(f"{name}:{rel}")
    all_blobs = set(rfs.listdir(blob_dir)) if rfs.isdir(blob_dir) else set()
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
