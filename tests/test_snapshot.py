"""Snapshot/restore: byte-identical query results, incremental blobs."""

from __future__ import annotations

import os
import shutil

import pytest

from mysql_es_spark.operators.query import bm25_topk, invalidate_stats_cache
from mysql_es_spark.plans.deletes import delete_by_query
from mysql_es_spark.plans.snapshot import (
    create_snapshot,
    list_snapshots,
    restore_snapshot,
)
from tests.conftest import TEST_CFG

Q = "w0 w3"


def _top(spark, ix, k=10):
    return [(r.docid, r.score) for r in bm25_topk(spark, ix, Q, k=k, cfg=TEST_CFG).collect()]


def test_snapshot_restore_roundtrip(spark, built_index, tmp_path):
    repo = str(tmp_path / "repo")
    want = _top(spark, built_index)

    m = create_snapshot(built_index, repo, "s1")
    # blobs_added < files is fine: identical contents (_SUCCESS markers,
    # equal footers) content-address to one blob even within a snapshot
    assert m["files"] > 0 and 0 < m["blobs_added"] <= m["files"]

    # re-snapshot of an unchanged index costs zero new blobs
    m2 = create_snapshot(built_index, repo, "s2")
    assert m2["blobs_added"] == 0 and m2["files"] == m["files"]
    assert [s["name"] for s in list_snapshots(repo)] == ["s1", "s2"]

    dest = str(tmp_path / "restored")
    r = restore_snapshot(repo, "s1", dest)
    assert r["files"] == m["files"] and r["bytes"] == m["bytes"]
    assert _top(spark, dest) == want


def test_snapshot_incremental_after_change(spark, built_index, tmp_path):
    """Soft-deleting adds a small deletes table; the next snapshot copies
    only the delta, and restoring the OLD snapshot resurrects pre-delete
    results (point-in-time recovery)."""
    ix = str(tmp_path / "ix")
    shutil.copytree(built_index, ix)
    repo = str(tmp_path / "repo")
    before = _top(spark, ix)

    m1 = create_snapshot(ix, repo, "pre")
    delete_by_query(spark, ix, "w3", cfg=TEST_CFG)
    invalidate_stats_cache(ix)
    after = _top(spark, ix)
    assert after != before

    m2 = create_snapshot(ix, repo, "post")
    assert 0 < m2["blobs_added"] < m1["files"], "delta snapshot re-copied everything"

    dest = str(tmp_path / "pit")
    restore_snapshot(repo, "pre", dest)
    assert _top(spark, dest) == before


def test_snapshot_validation(tmp_path, built_index):
    repo = str(tmp_path / "repo")
    with pytest.raises(ValueError):
        create_snapshot(str(tmp_path / "nope"), repo, "x")
    create_snapshot(built_index, repo, "dup")
    with pytest.raises(ValueError):
        create_snapshot(built_index, repo, "dup")
    with pytest.raises(ValueError):
        restore_snapshot(repo, "missing", str(tmp_path / "d"))
    with pytest.raises(ValueError):
        restore_snapshot(repo, "dup", built_index)  # target exists
    assert list_snapshots(str(tmp_path / "empty")) == []


def test_snapshot_resolves_alias(spark, built_index, tmp_path):
    """Snapshotting an alias must archive the TARGET's data, and the
    restored copy must serve identical results."""
    from mysql_es_spark.plans.alias import set_alias

    al = str(tmp_path / "al")
    set_alias(al, built_index)
    repo = str(tmp_path / "repo")
    m = create_snapshot(al, repo, "via-alias")
    assert m["files"] > 10  # real index files, not the one-line pointer
    dest = str(tmp_path / "restored")
    restore_snapshot(repo, "via-alias", dest)
    assert _top(spark, dest) == _top(spark, built_index)


def test_snapshot_retention_and_gc(spark, built_index, tmp_path):
    """SLM retention: prune old snapshots, GC exactly the blobs only they
    referenced; shared blobs survive and the newest snapshot still
    restores byte-identically."""
    from mysql_es_spark.plans.snapshot import delete_snapshot, gc_blobs, prune_snapshots

    ix = str(tmp_path / "ix")
    shutil.copytree(built_index, ix)
    repo = str(tmp_path / "repo")
    create_snapshot(ix, repo, "s1")
    delete_by_query(spark, ix, "w3", cfg=TEST_CFG)
    invalidate_stats_cache(ix)
    create_snapshot(ix, repo, "s2")
    after = _top(spark, ix)
    blob_dir = os.path.join(repo, "blobs")
    n_before = len(os.listdir(blob_dir))

    out = delete_snapshot(repo, "s1")
    assert out["deleted"] == "s1" and out["blobs_removed"] >= 0
    assert [s["name"] for s in list_snapshots(repo)] == ["s2"]
    # shared blobs survive: s2 still restores byte-identically
    dest = str(tmp_path / "restored")
    restore_snapshot(repo, "s2", dest)
    assert _top(spark, dest) == after
    assert len(os.listdir(blob_dir)) == n_before - out["blobs_removed"]
    # gc on a consistent repo is a no-op
    assert gc_blobs(repo) == {"blobs_removed": 0, "bytes_reclaimed": 0}

    # prune keep_last
    create_snapshot(ix, repo, "s3")  # identical to s2 → blobs_added == 0
    create_snapshot(dest, repo, "s4")
    pr = prune_snapshots(repo, keep_last=2)
    assert pr["deleted"] == ["s2"]
    assert [s["name"] for s in list_snapshots(repo)] == ["s3", "s4"]
    # s3 shares every blob with the deleted s2 → nothing reclaimed
    dest2 = str(tmp_path / "restored2")
    restore_snapshot(repo, "s3", dest2)
    assert _top(spark, dest2) == after
    with pytest.raises(ValueError):
        delete_snapshot(repo, "nope")
    with pytest.raises(ValueError):
        prune_snapshots(repo, keep_last=0)


def test_verify_repo(spark, built_index, tmp_path):
    import json as _json
    import os as _os

    from mysql_es_spark.plans.snapshot import create_snapshot, verify_repo

    repo = str(tmp_path / "vrepo")
    create_snapshot(built_index, repo, "v1")
    r = verify_repo(repo, deep=True)
    assert r["ok"] and r["snapshots"] == 1 and not r["missing"] and not r["corrupt"]

    # corrupt one referenced blob: shallow sees the size change, deep the hash
    man = _json.load(open(f"{repo}/snapshots/v1.json"))["files"]
    digest = next(m["blob"] for m in man.values() if m["size"] > 0)
    blob = f"{repo}/blobs/{digest}"
    orig = open(blob, "rb").read()
    try:
        with open(blob, "wb") as f:
            f.write(orig + b"x")
        assert verify_repo(repo)["size_mismatch"]
        with open(blob, "wb") as f:
            f.write(orig[:-1] + bytes([orig[-1] ^ 1]))
        deep = verify_repo(repo, deep=True)
        assert deep["corrupt"] and not deep["ok"]
        _os.remove(blob)
        assert verify_repo(repo)["missing"]
    finally:
        with open(blob, "wb") as f:
            f.write(orig)
    assert verify_repo(repo, deep=True)["ok"]


def test_snapshot_over_hadoop_scheme(spark, built_index, tmp_path):
    """Round-4 object-storage safety (VERDICT r3 item 7): the whole
    snapshot lifecycle must run with the REPO addressed by a non-local
    scheme — file:// here, which routes every operation through the
    Hadoop FileSystem backend (the same code path as s3a://hdfs://),
    while the index stays a plain local path (cross-backend copy)."""
    from mysql_es_spark.plans.snapshot import (
        create_snapshot,
        delete_snapshot,
        list_snapshots,
        restore_snapshot,
        verify_repo,
    )
    from mysql_es_spark.sources import fsio

    repo = "file://" + str(tmp_path / "hrepo")
    assert fsio.has_scheme(repo) and isinstance(fsio.fs_for(repo), fsio.HadoopFs)

    r1 = create_snapshot(built_index, repo, "h1")
    assert r1["files"] > 0 and r1["blobs_added"] > 0
    # incremental: unchanged index re-snapshot uploads nothing
    r2 = create_snapshot(built_index, repo, "h2")
    assert r2["blobs_added"] == 0 and r2["files"] == r1["files"]
    assert [s["name"] for s in list_snapshots(repo)] == ["h1", "h2"]
    assert verify_repo(repo, deep=True)["ok"]

    # restore to a schemed destination too, then query it
    dest = "file://" + str(tmp_path / "hrestore")
    rr = restore_snapshot(repo, "h1", dest)
    assert rr["files"] == r1["files"]
    local_dest = str(tmp_path / "hrestore")
    want = _top(spark, built_index)
    assert _top(spark, local_dest) == want

    d = delete_snapshot(repo, "h1")
    assert d["deleted"] == "h1" and d["blobs_removed"] == 0  # h2 shares blobs
    assert [s["name"] for s in list_snapshots(repo)] == ["h2"]


def test_snapshot_of_schemed_index(spark, built_index, tmp_path):
    """Round-5 (ADVICE r4): the INDEX side addressed by a scheme. Hadoop
    listFiles returns qualified status paths (file:///x normalizes to
    file:/x), so relpath must qualify the root through the same
    FileSystem before prefix-stripping — previously this raised
    ValueError for every file. Manifest relpaths must come out identical
    to the plain-path snapshot's."""
    from mysql_es_spark.plans.snapshot import create_snapshot, list_snapshots

    repo = str(tmp_path / "srepo")
    plain = create_snapshot(built_index, repo, "plain")
    schemed = create_snapshot("file://" + built_index, repo, "schemed")
    assert schemed["files"] == plain["files"]
    assert schemed["bytes"] == plain["bytes"]
    # byte-identical content ⇒ every blob is shared with the plain snap
    assert schemed["blobs_added"] == 0
    snaps = {s["name"]: s for s in list_snapshots(repo)}
    assert snaps["schemed"]["files"] == snaps["plain"]["files"]


def test_index_stats_and_disk_usage_over_scheme(spark, built_index):
    """index_stats/disk_usage must produce identical numbers when the
    index is addressed via file:// (Hadoop backend, seekable footer
    reads) as via the plain local path."""
    from mysql_es_spark.operators.query import disk_usage, index_stats

    plain_s = index_stats(spark, built_index)
    schemed_s = index_stats(spark, "file://" + built_index)
    assert schemed_s == plain_s
    plain_d = disk_usage(spark, built_index)
    schemed_d = disk_usage(spark, "file://" + built_index)
    assert schemed_d == plain_d
    assert plain_d["all_fields_bytes"] > 0
