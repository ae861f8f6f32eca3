"""ES ``_index_template`` / ``_component_template``: settings by pattern.

ES composable index templates decide a new index's settings from its
NAME: the highest-priority template whose ``index_patterns`` match
applies, composing its ``composed_of`` component templates in order
(later wins) with the template's own settings last. Equal-priority
overlapping matches are an error at put time in ES; enforced here at
resolve time, where the overlap is actually observable. The reference
ships exactly this mechanism (etc/template.json is applied to every
index the river creates — Es.java createIndex applies the template).

Spark-first mapping: "settings" are IndexConfig fields (analyzer,
positions, synonyms, physical layout) — the same knobs the index
persists in index_meta, so a template-created index remains fully
self-describing. Templates live in a small JSON repo file (cluster
state, not data — ES keeps them in cluster metadata too); nothing here
touches a SparkSession.

``config_for`` is the build hook: resolve the index name, overlay the
matched settings on a base config, and hand the result to build_index.
CLI: ``build --template-repo <dir>`` does exactly that.
"""

from __future__ import annotations

import dataclasses
import fnmatch
import json
import os

from ..config import IndexConfig

_FILE = "_index_templates.json"
_FIELDS = {f.name for f in dataclasses.fields(IndexConfig)}


def _load(repo: str) -> dict:
    p = os.path.join(repo, _FILE)
    if not os.path.exists(p):
        return {"templates": {}, "components": {}}
    with open(p) as f:
        return json.load(f)


def _save(repo: str, state: dict) -> None:
    os.makedirs(repo, exist_ok=True)
    tmp = os.path.join(repo, _FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(state, f, sort_keys=True, indent=1)
    os.replace(tmp, os.path.join(repo, _FILE))  # atomic swap, crash-safe


def _check_settings(settings: dict, what: str) -> dict:
    bad = set(settings) - _FIELDS
    if bad:
        raise ValueError(f"{what}: unknown IndexConfig field(s) {sorted(bad)}")
    # round-trip through the dataclass so type errors fail at put time,
    # not at build time (synonyms arrive as lists from JSON)
    norm = {
        k: tuple(v) if isinstance(v, list) else v for k, v in settings.items()
    }
    IndexConfig().with_(**norm)
    return {k: list(v) if isinstance(v, tuple) else v for k, v in norm.items()}


def put_component_template(repo: str, name: str, settings: dict) -> None:
    state = _load(repo)
    state["components"][name] = _check_settings(settings, f"component {name!r}")
    _save(repo, state)


def put_index_template(
    repo: str,
    name: str,
    index_patterns: list[str],
    settings: dict | None = None,
    composed_of: list[str] | None = None,
    priority: int = 0,
) -> None:
    if not index_patterns:
        raise ValueError("index_patterns must be non-empty")
    state = _load(repo)
    for c in composed_of or []:
        if c not in state["components"]:
            raise ValueError(f"composed_of names unknown component {c!r}")
    state["templates"][name] = {
        "index_patterns": list(index_patterns),
        "settings": _check_settings(settings or {}, f"template {name!r}"),
        "composed_of": list(composed_of or []),
        "priority": int(priority),
    }
    _save(repo, state)


def resolve_index_template(repo: str, index_name: str) -> dict | None:
    """The effective settings dict for ``index_name``: components of the
    winning template merged in composed_of order (later wins), template's
    own settings last. None when nothing matches. Two matches at the same
    highest priority → error (the ES overlap rule)."""
    state = _load(repo)
    matches = [
        (t["priority"], name, t)
        for name, t in state["templates"].items()
        if any(fnmatch.fnmatchcase(index_name, p) for p in t["index_patterns"])
    ]
    if not matches:
        return None
    top = max(p for p, _n, _t in matches)
    winners = [(n, t) for p, n, t in matches if p == top]
    if len(winners) > 1:
        raise ValueError(
            f"index {index_name!r} matches templates "
            f"{sorted(n for n, _ in winners)} at equal priority {top} — "
            "ES rejects overlapping same-priority templates"
        )
    _, t = winners[0]
    eff: dict = {}
    for c in t["composed_of"]:
        eff.update(state["components"][c])
    eff.update(t["settings"])
    return eff


def config_for(
    repo: str, index_name: str, base: IndexConfig | None = None
) -> IndexConfig:
    """The IndexConfig a new index named ``index_name`` gets: the matched
    template's effective settings overlaid on ``base`` (engine defaults
    when None)."""
    cfg = base or IndexConfig()
    eff = resolve_index_template(repo, index_name)
    if not eff:
        return cfg
    return cfg.with_(
        **{k: tuple(v) if isinstance(v, list) else v for k, v in eff.items()}
    )
