"""ES ``_query_rules``: curated pin/exclude rules applied by metadata.

The query-rules API (ES 8.10+, ``rule`` retriever) lets search curators
say "when the user's query looks like X, pin these documents / exclude
those" without touching ranking code: a ruleset is a list of rules,
each with criteria over the request's metadata (exact / contains /
prefix / suffix / always) and an action (``pinned`` or ``exclude``)
carrying document ids. At search time every rule whose criteria ALL
match contributes its ids; pins apply in ruleset order ahead of the
organic ranking, excluded docs vanish from it.

Spark-first: criteria evaluate driver-side on the request's metadata
dict (a handful of string comparisons — ES evaluates them on the
coordinating node too); the search itself reuses the pinned-query plan
(deterministic pinned_base - i scoring ahead of organic BM25) plus one
isin anti-filter for exclusions. Rulesets persist per index like stored
search templates, so the index stays self-describing.

Reference context: the reference's synced docs live in exactly the kind
of ES index these merchandising/curation rules run against.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..sources import tables as tbl

_SCHEMA = "ruleset_id string, rules string"
_TYPES = ("exact", "contains", "prefix", "suffix", "always")
_ACTIONS = ("pinned", "exclude")


def validate_ruleset(rules: list[dict]) -> list[dict]:
    if not isinstance(rules, list) or not rules:
        raise ValueError("a ruleset is a non-empty list of rules")
    for i, r in enumerate(rules):
        if r.get("type") not in _ACTIONS:
            raise ValueError(f"rule {i}: type must be one of {_ACTIONS}")
        ids = r.get("ids")
        if not isinstance(ids, list) or not ids:
            raise ValueError(f"rule {i}: ids must be a non-empty list")
        crits = r.get("criteria")
        if not isinstance(crits, list) or not crits:
            raise ValueError(f"rule {i}: criteria must be a non-empty list")
        for c in crits:
            if c.get("type") not in _TYPES:
                raise ValueError(f"rule {i}: criterion type must be one of {_TYPES}")
            if c["type"] != "always" and (
                not c.get("metadata") or not isinstance(c.get("values"), list)
            ):
                raise ValueError(
                    f"rule {i}: non-always criteria need metadata + values"
                )
    return rules


def _criterion_matches(c: dict, metadata: dict) -> bool:
    if c["type"] == "always":
        return True
    v = metadata.get(c["metadata"])
    if v is None:
        return False
    v = str(v)
    for want in c["values"]:
        w = str(want)
        if (
            (c["type"] == "exact" and v == w)
            or (c["type"] == "contains" and w in v)
            or (c["type"] == "prefix" and v.startswith(w))
            or (c["type"] == "suffix" and v.endswith(w))
        ):
            return True
    return False


def matching_actions(rules: list[dict], metadata: dict) -> tuple[list[str], set[str]]:
    """(pinned ids in ruleset order, excluded id set) from every rule
    whose criteria ALL match. A doc both pinned and excluded is excluded
    (the conservative reading; ES applies exclude after pin)."""
    pins: list[str] = []
    excl: set[str] = set()
    for r in rules:
        if all(_criterion_matches(c, metadata) for c in r["criteria"]):
            if r["type"] == "pinned":
                pins.extend(str(i) for i in r["ids"] if str(i) not in pins)
            else:
                excl.update(str(i) for i in r["ids"])
    return [p for p in pins if p not in excl], excl


def put_ruleset(
    spark: SparkSession, index_dir: str, ruleset_id: str, rules: list[dict]
) -> None:
    """Store (or replace) a ruleset under this index — ES PUT
    _query_rules/{id}."""
    validate_ruleset(rules)
    existing = list_rulesets(spark, index_dir)
    rows = [
        (r.ruleset_id, r.rules)
        for r in existing.collect()
        if r.ruleset_id != ruleset_id
    ]
    rows.append((ruleset_id, json.dumps(rules, sort_keys=True)))
    tbl.local_rows_df(spark, sorted(rows), _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tbl.p(index_dir, "query_rulesets"))


def list_rulesets(spark: SparkSession, index_dir: str) -> DataFrame:
    d = tbl.p(index_dir, "query_rulesets")
    if not os.path.isdir(d):
        return tbl.local_rows_df(spark, [], _SCHEMA)
    return spark.read.parquet(d)


def get_ruleset(spark: SparkSession, index_dir: str, ruleset_id: str) -> list[dict]:
    rows = list_rulesets(spark, index_dir).filter(
        F.col("ruleset_id") == ruleset_id
    ).collect()
    if not rows:
        raise KeyError(f"no ruleset {ruleset_id!r} in this index")
    return json.loads(rows[0]["rules"])


def rules_topk(
    spark: SparkSession,
    index_dir: str,
    query: str,
    ruleset: str | list[dict],
    metadata: dict | None = None,
    k: int = 10,
    cfg: IndexConfig | None = None,
    with_keys: bool = False,
) -> DataFrame:
    """ES ``rule`` retriever: top-k BM25 with the matching rules'
    curation applied — pinned docs first (deterministic pinned_base - i
    scores), excluded docs dropped from the organic ranking.
    ``metadata`` defaults to {"user_query": query}, the ES convention.
    ``ruleset`` is a stored ruleset id or an inline rule list."""
    from .query import pinned_topk

    rules = (
        get_ruleset(spark, index_dir, ruleset)
        if isinstance(ruleset, str)
        else validate_ruleset(ruleset)
    )
    md = metadata if metadata is not None else {"user_query": query}
    pins, excl = matching_actions(rules, md)
    out = pinned_topk(
        spark, index_dir, query, pins, k=k + len(excl), cfg=cfg, with_keys=True
    )
    if excl:
        out = out.filter(~F.col("doc_key").isin(sorted(excl)))
    out = out.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(int(k))
    return out if with_keys else out.drop("doc_key", "conv_id", "turn_idx")
