"""Index lifecycle management — ES ILM, for the rolled-alias layout.

The reference keeps one ever-growing ES index per river; production ES
deployments instead bound index size with ILM: a declarative policy
(hot → warm → delete) that rolls the write index over, force-merges
aged-out generations, and finally snapshots + deletes them. This module
is that policy engine over the building blocks this repo already has:

- hot/rollover   → plans/alias.rollover (metadata-only condition check)
- warm/forcemerge→ plans/compact.compact_index (rank-identity rewrite),
                   swapped in place with the same atomic-rename dance
                   readers already tolerate (resolved paths stay valid)
- delete         → optional create_snapshot (ES `wait_for_snapshot`
                   analog) then directory removal

Everything is driven by ONE reconciliation pass, ``ilm_tick(now=...)``,
with the clock passed in explicitly — a scheduler calls it with
``time.time()``; tests pass synthetic instants so every transition is
deterministic. State (per-generation birth time + actions done) lives
in ``_ILM_STATE.json`` beside the alias pointer; the policy in
``_ILM_POLICY.json``. Both are atomic write-then-rename writes, so a
crashed tick never leaves a torn file, and a re-run tick is idempotent
(each action is recorded before the next is attempted).

Scale note: a tick touches only filesystem metadata plus the indices it
actually transitions; the expensive action (forcemerge) is the same
distributed compact job users run by hand, and at most one generation
enters it per tick per phase, so a fleet-wide scheduler can tick
thousands of aliases cheaply.
"""

from __future__ import annotations

import json
import re

from ..sources import fsio

POLICY_FILE = "_ILM_POLICY.json"
STATE_FILE = "_ILM_STATE.json"

_PHASES = {"hot", "warm", "delete"}
_AGE_RE = re.compile(r"^(\d+(?:\.\d+)?)(s|m|h|d)$")
_UNIT_S = {"s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}


def parse_age(v) -> float:
    """``min_age`` in seconds: a number, or ES duration syntax
    ("30s", "15m", "2h", "7d")."""
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        if v < 0:
            raise ValueError(f"min_age must be >= 0, got {v}")
        return float(v)
    if isinstance(v, str):
        m = _AGE_RE.match(v.strip())
        if m:
            return float(m.group(1)) * _UNIT_S[m.group(2)]
    raise ValueError(f"bad min_age {v!r} (want seconds or '30s'/'15m'/'2h'/'7d')")


def _validate_policy(policy: dict) -> dict:
    if not isinstance(policy, dict) or not policy:
        raise ValueError("policy must be a non-empty dict of phases")
    bad = set(policy) - _PHASES
    if bad:
        raise ValueError(f"unknown ILM phases {sorted(bad)}; supported: {sorted(_PHASES)}")
    norm: dict = {}
    if "hot" in policy:
        hot = policy["hot"]
        ro = hot.get("rollover") if isinstance(hot, dict) else None
        if not isinstance(ro, dict) or not (
            {"max_docs", "max_bytes"} & set(ro)
        ):
            raise ValueError("hot phase needs rollover: {max_docs and/or max_bytes}")
        extra = set(ro) - {"max_docs", "max_bytes"}
        if extra:
            raise ValueError(f"unknown rollover conditions {sorted(extra)}")
        norm["hot"] = {"rollover": {k: int(v) for k, v in ro.items()}}
    if "warm" in policy:
        warm = policy["warm"]
        if not isinstance(warm, dict) or "min_age" not in warm:
            raise ValueError("warm phase needs min_age")
        extra = set(warm) - {"min_age", "forcemerge", "reshard"}
        if extra:
            raise ValueError(f"unknown warm actions {sorted(extra)}")
        norm["warm"] = {
            "min_age": parse_age(warm["min_age"]),
            "forcemerge": bool(warm.get("forcemerge", True)),
        }
        if warm.get("reshard") is not None:
            norm["warm"]["reshard"] = dict(warm["reshard"])
    if "delete" in policy:
        dele = policy["delete"]
        if not isinstance(dele, dict) or "min_age" not in dele:
            raise ValueError("delete phase needs min_age")
        extra = set(dele) - {"min_age", "snapshot_repo"}
        if extra:
            raise ValueError(f"unknown delete options {sorted(extra)}")
        norm["delete"] = {"min_age": parse_age(dele["min_age"])}
        if dele.get("snapshot_repo"):
            norm["delete"]["snapshot_repo"] = str(dele["snapshot_repo"])
    if "warm" in norm and "delete" in norm and norm["delete"]["min_age"] < norm["warm"]["min_age"]:
        raise ValueError("delete.min_age must be >= warm.min_age")
    return norm


def _write_json(path: str, obj: dict) -> None:
    # atomic on either backend (local tmp+rename / Hadoop create+rename)
    fsio.write_text(path, json.dumps(obj, indent=1, sort_keys=True))


def put_policy(alias_dir: str, policy: dict) -> dict:
    """Attach a lifecycle policy to an alias (ES ``_ilm/policy`` +
    ``index.lifecycle.name`` in one step). Returns the normalized
    policy (ages in seconds) that ticks will execute."""
    from .alias import get_alias

    if get_alias(alias_dir) is None:
        raise ValueError(f"{alias_dir} is not an alias (ILM manages rolled aliases)")
    norm = _validate_policy(policy)
    _write_json(fsio.join(alias_dir, POLICY_FILE), norm)
    return norm


def get_policy(alias_dir: str) -> dict | None:
    p = fsio.join(alias_dir, POLICY_FILE)
    if not fsio.isfile(p):
        return None
    return json.loads(fsio.read_text(p))


def _load_state(alias_dir: str) -> dict:
    p = fsio.join(alias_dir, STATE_FILE)
    if not fsio.isfile(p):
        return {"generations": {}}
    return json.loads(fsio.read_text(p))


def _register_generations(alias_dir: str, state: dict, now: float) -> None:
    """Record a birth time for every generation we haven't seen yet.

    ES stamps creation_date at index creation; here the first tick that
    observes a generation adopts it (rollover-created generations are
    observed by the very tick that made them, so their age is exact)."""
    from .alias import list_generations

    for name, d in list_generations(alias_dir).items():
        state["generations"].setdefault(
            name, {"dir": fsio.absolute(d), "created": now, "forcemerged": False,
                   "phase": "hot"}
        )


def explain_lifecycle(alias_dir: str, now: float) -> list[dict]:
    """ES ``_ilm/explain``: one row per managed generation — age, current
    phase, actions already applied, and whether it is the write index."""
    from .alias import get_alias

    state = _load_state(alias_dir)
    _register_generations(alias_dir, state, now)
    write = get_alias(alias_dir)
    out = []
    for name, g in sorted(state["generations"].items()):
        out.append(
            {
                "generation": name,
                "dir": g["dir"],
                "age_sec": max(0.0, now - g["created"]),
                "phase": g["phase"],
                "forcemerged": g["forcemerged"],
                "is_write_index": write is not None
                and fsio.absolute(write) == g["dir"],
            }
        )
    return out


def _swap_in_compacted(spark, gen_dir: str, cfg, reshard: dict | None) -> dict:
    """Force-merge ``gen_dir`` aside, then swap the optimized copy into
    the generation's path (rename old → .old, rename new → path, rm old).
    In-flight queries hold already-resolved file paths, so they finish
    against the old files exactly as with compact-then-realias."""
    from ..operators.query import invalidate_stats_cache
    from .compact import compact_index

    tmp_new = gen_dir + ".ilm-compact"
    old = gen_dir + ".ilm-old"
    fsio.rmtree(tmp_new)
    fsio.rmtree(old)
    stats = compact_index(spark, gen_dir, tmp_new, cfg=cfg, reshard=reshard)
    fsio.rename(gen_dir, old)
    fsio.rename(tmp_new, gen_dir)
    fsio.rmtree(old)
    invalidate_stats_cache(gen_dir)
    return stats


def ilm_tick(spark, alias_dir: str, now: float, cfg=None) -> dict:
    """One reconciliation pass of the alias's lifecycle policy.

    Order mirrors ES: the write index is only ever subject to the hot
    phase (rollover); non-write generations age through warm
    (forcemerge, at most the policy's actions once) and then delete
    (optional snapshot, then removal). ``now`` is the caller's clock —
    pass ``time.time()`` from a scheduler, synthetic instants in tests.

    Returns {rolled, new_index, compacted: [...], deleted: [...],
    snapshots: [...], generations}.
    """
    from ..operators.query import invalidate_stats_cache
    from .alias import get_alias, rollover

    policy = get_policy(alias_dir)
    if policy is None:
        raise ValueError(f"{alias_dir} has no ILM policy (put_policy first)")
    state = _load_state(alias_dir)
    _register_generations(alias_dir, state, now)
    state_path = fsio.join(alias_dir, STATE_FILE)
    out: dict = {
        "rolled": False, "new_index": None, "compacted": [], "deleted": [],
        "snapshots": [],
    }

    if "hot" in policy:
        ro = policy["hot"]["rollover"]
        r = rollover(
            spark, alias_dir, cfg=cfg,
            max_docs=ro.get("max_docs"), max_bytes=ro.get("max_bytes"),
        )
        if r["rolled"]:
            out["rolled"] = True
            out["new_index"] = r["new_index"]
            _register_generations(alias_dir, state, now)
            _write_json(state_path, state)

    write = get_alias(alias_dir)
    write_abs = fsio.absolute(write) if write else None
    for name, g in sorted(state["generations"].items(), key=lambda kv: kv[1]["created"]):
        if g["phase"] == "deleted" or g["dir"] == write_abs:
            continue
        age = now - g["created"]
        dele = policy.get("delete")
        warm = policy.get("warm")
        if dele and age >= dele["min_age"]:
            repo = dele.get("snapshot_repo")
            if repo:
                from .snapshot import create_snapshot

                snap = f"ilm-{name}"
                try:
                    create_snapshot(g["dir"], repo, snap)
                except ValueError as e:  # re-run after a crash mid-tick
                    if "already exists" not in str(e):
                        raise
                out["snapshots"].append(snap)
            fsio.rmtree(g["dir"])
            invalidate_stats_cache(g["dir"])
            g["phase"] = "deleted"
            out["deleted"].append(name)
            _write_json(state_path, state)
        elif warm and age >= warm["min_age"]:
            if warm["forcemerge"] and not g["forcemerged"]:
                _swap_in_compacted(spark, g["dir"], cfg, warm.get("reshard"))
                g["forcemerged"] = True
                out["compacted"].append(name)
            g["phase"] = "warm"
            _write_json(state_path, state)

    _write_json(state_path, state)
    out["generations"] = sum(
        1 for g in state["generations"].values() if g["phase"] != "deleted"
    )
    return out
