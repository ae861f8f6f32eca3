"""ILM: policy-driven rollover → forcemerge → snapshot+delete.

The clock is injected (ilm_tick(now=...)), so every phase transition is
deterministic; rank-identity is asserted across the in-place forcemerge
swap and the snapshot/restore of a deleted generation.
"""

from __future__ import annotations

import os
import shutil

import pytest

from mysql_es_spark.operators.query import bm25_topk
from mysql_es_spark.plans.alias import get_alias, set_alias
from mysql_es_spark.plans.ilm import (
    explain_lifecycle,
    get_policy,
    ilm_tick,
    parse_age,
    put_policy,
)
from mysql_es_spark.plans.snapshot import restore_snapshot
from tests.conftest import TEST_CFG

Q = "w0 w3"


def _top(spark, ix, k=10):
    return [
        (r.docid, round(r.score, 6))
        for r in bm25_topk(spark, str(ix), Q, k=k, cfg=TEST_CFG).collect()
    ]


def test_parse_age():
    assert parse_age(30) == 30.0
    assert parse_age("30s") == 30.0
    assert parse_age("15m") == 900.0
    assert parse_age("2h") == 7200.0
    assert parse_age("7d") == 7 * 86400.0
    for bad in ("7w", "s", -1, "x5d", None, True):
        with pytest.raises(ValueError):
            parse_age(bad)


def test_policy_validation(spark, built_index, tmp_path):
    al = str(tmp_path / "al")
    with pytest.raises(ValueError, match="not an alias"):
        put_policy(built_index, {"hot": {"rollover": {"max_docs": 1}}})
    set_alias(al, built_index)
    with pytest.raises(ValueError, match="unknown ILM phases"):
        put_policy(al, {"frozen": {}})
    with pytest.raises(ValueError, match="rollover"):
        put_policy(al, {"hot": {}})
    with pytest.raises(ValueError, match="min_age"):
        put_policy(al, {"warm": {"forcemerge": True}})
    with pytest.raises(ValueError, match="delete.min_age"):
        put_policy(al, {"warm": {"min_age": "1h"}, "delete": {"min_age": "30s"}})
    with pytest.raises(ValueError, match="no ILM policy"):
        ilm_tick(spark, al, now=0.0)
    norm = put_policy(al, {"warm": {"min_age": "1m"}, "delete": {"min_age": 3600}})
    assert norm == {
        "warm": {"min_age": 60.0, "forcemerge": True},
        "delete": {"min_age": 3600.0},
    }
    assert get_policy(al) == norm


def test_full_lifecycle(spark, built_index, tmp_path):
    ix = tmp_path / "ix"
    shutil.copytree(built_index, ix)
    al = str(tmp_path / "al")
    repo = str(tmp_path / "repo")
    set_alias(al, str(ix))
    put_policy(
        al,
        {
            "hot": {"rollover": {"max_docs": 1}},
            "warm": {"min_age": "10s", "forcemerge": True},
            "delete": {"min_age": 100, "snapshot_repo": repo},
        },
    )
    want = _top(spark, ix)

    # t=0: the write index is over max_docs → rollover; old gen is hot
    r0 = ilm_tick(spark, al, now=0.0, cfg=TEST_CFG)
    assert r0["rolled"] and get_alias(al).endswith("-000001")
    assert r0["compacted"] == [] and r0["deleted"] == []
    ex = {e["generation"]: e for e in explain_lifecycle(al, now=0.0)}
    assert ex["ix"]["phase"] == "hot" and not ex["ix"]["is_write_index"]
    assert ex["al-000001"]["is_write_index"]

    # t=5 < warm.min_age: nothing transitions; empty write index never rolls
    r1 = ilm_tick(spark, al, now=5.0, cfg=TEST_CFG)
    assert not (r1["rolled"] or r1["compacted"] or r1["deleted"])

    # t=20 ≥ warm: old generation force-merged IN PLACE, rank-identical
    r2 = ilm_tick(spark, al, now=20.0, cfg=TEST_CFG)
    assert r2["compacted"] == ["ix"] and r2["deleted"] == []
    assert _top(spark, ix) == want
    ex = {e["generation"]: e for e in explain_lifecycle(al, now=20.0)}
    assert ex["ix"]["phase"] == "warm" and ex["ix"]["forcemerged"]

    # same instant again: idempotent (forcemerge recorded, not repeated)
    r3 = ilm_tick(spark, al, now=20.0, cfg=TEST_CFG)
    assert r3["compacted"] == [] and r3["deleted"] == []

    # t=150 ≥ delete: snapshot taken, then the generation is removed;
    # the write index is never eligible
    r4 = ilm_tick(spark, al, now=150.0, cfg=TEST_CFG)
    assert r4["deleted"] == ["ix"] and r4["snapshots"] == ["ilm-ix"]
    assert not ix.exists()
    assert os.path.isdir(get_alias(al))
    assert r4["generations"] == 1

    # point-in-time recovery of the deleted generation
    dest = tmp_path / "restored"
    restore_snapshot(repo, "ilm-ix", str(dest))
    assert _top(spark, dest) == want

    # deleted generations stay deleted on later ticks
    r5 = ilm_tick(spark, al, now=500.0, cfg=TEST_CFG)
    assert r5["deleted"] == [] and r5["snapshots"] == []


def test_ilm_over_hadoop_scheme(spark, built_index, tmp_path):
    """Round-5 object-storage control plane: the ENTIRE lifecycle driven
    with the alias addressed via file:// (the Hadoop backend — the same
    code path as s3a://): policy/state JSON reads+writes, rollover's
    size walk, forcemerge's aside-swap renames, and generation delete
    all go through fsio."""
    ix = tmp_path / "ix"
    shutil.copytree(built_index, ix)
    al_local = str(tmp_path / "hal")
    al = "file://" + al_local
    set_alias(al, str(ix))
    put_policy(
        al,
        {
            "hot": {"rollover": {"max_docs": 1}},
            "warm": {"min_age": "10s", "forcemerge": True},
            "delete": {"min_age": 100},
        },
    )
    assert get_policy(al) is not None
    want = _top(spark, ix)

    r0 = ilm_tick(spark, al, now=0.0, cfg=TEST_CFG)
    assert r0["rolled"] and get_alias(al).endswith("-000001")
    r2 = ilm_tick(spark, al, now=20.0, cfg=TEST_CFG)
    assert r2["compacted"] == ["ix"]
    assert _top(spark, ix) == want  # in-place swap rank-identical
    r4 = ilm_tick(spark, al, now=150.0, cfg=TEST_CFG)
    assert r4["deleted"] == ["ix"] and not ix.exists()
    # state/policy files live under the plain alias dir (one location
    # for both spellings), readable via either path form
    assert get_policy(al_local) == get_policy(al)


def test_cli_ilm(spark, built_index, tmp_path, capsys):
    import json

    from mysql_es_spark.cli import main as cli_main

    ix = tmp_path / "ix"
    shutil.copytree(built_index, ix)
    al = str(tmp_path / "al")
    set_alias(al, str(ix))

    policy = json.dumps({"hot": {"rollover": {"max_docs": 1}},
                         "delete": {"min_age": "10s"}})
    assert cli_main(["ilm", "put-policy", "--alias", al, "--policy", policy]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["policy"]["delete"]["min_age"] == 10.0

    assert cli_main(["ilm", "tick", "--alias", al, "--now", "0"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rolled"]

    assert cli_main(["ilm", "explain", "--alias", al, "--now", "20"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {g["generation"] for g in out["generations"]} == {"ix", "al-000001"}


def test_warm_without_delete_and_no_snapshot(spark, built_index, tmp_path):
    """delete without snapshot_repo removes the generation outright."""
    ix = tmp_path / "ix"
    shutil.copytree(built_index, ix)
    al = str(tmp_path / "al")
    set_alias(al, str(ix))
    put_policy(
        al,
        {"hot": {"rollover": {"max_docs": 1}}, "delete": {"min_age": "10s"}},
    )
    ilm_tick(spark, al, now=0.0, cfg=TEST_CFG)
    r = ilm_tick(spark, al, now=11.0, cfg=TEST_CFG)
    assert r["deleted"] == ["ix"] and r["snapshots"] == []
    assert not ix.exists()
