"""ES search templates — the mustache subset search bodies actually use.

The reference config layer already does ``${SCHEMA}``/``${TABLE}``
substitution at index-name level (River.java:364-379 fixName); ES search
templates extend the same idea to query bodies: a stored source with
``{{param}}`` placeholders rendered per request (_render API, then
_search/template). This module implements the subset that covers real
usage, deterministically and without a scripting engine:

- ``{{name}}``            — required parameter, rendered as text
- ``{{name}}{{^name}}default{{/name}}`` — parameter with inline default
- ``{{#toJson}}name{{/toJson}}``        — parameter rendered as JSON
- ``{{#name}}...{{/name}}``             — conditional section: body kept
  (with inner substitution) iff the parameter is truthy

Stored templates live per index as a tiny ``search_templates`` parquet
(id → source), mirroring ES's cluster-state script store; they ride
snapshots/aliases for free because they are just another index table.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from ..sources import tables as tbl

_SECTION = re.compile(r"\{\{#(?!toJson)(\w+)\}\}(.*?)\{\{/\1\}\}", re.S)
_TOJSON = re.compile(r"\{\{#toJson\}\}\s*(\w+)\s*\{\{/toJson\}\}")
_DEFAULT = re.compile(r"\{\{(\w+)\}\}\{\{\^\1\}\}(.*?)\{\{/\1\}\}", re.S)
_VAR = re.compile(r"\{\{(\w+)\}\}")


def render_template(source: str, params: dict) -> str:
    """Render a mustache-subset template. Raises KeyError for a ``{{name}}``
    with no param and no inline default; unknown constructs are left
    verbatim (and will fail loudly downstream) rather than guessed at."""

    def section(m: re.Match) -> str:
        return m.group(2) if params.get(m.group(1)) else ""

    out = _SECTION.sub(section, source)
    out = _TOJSON.sub(lambda m: json.dumps(params[m.group(1)], sort_keys=True), out)
    out = _DEFAULT.sub(
        lambda m: str(params[m.group(1)]) if m.group(1) in params else m.group(2), out
    )

    def var(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise KeyError(f"search template parameter {name!r} has no value")
        return str(params[name])

    return _VAR.sub(var, out)


_SCHEMA = "template_id string, source string"


def put_template(spark: SparkSession, index_dir: str, template_id: str, source: str) -> None:
    """Store (or replace) a template under this index — ES _scripts PUT."""
    existing = list_templates(spark, index_dir)
    rows = [(t.template_id, t.source) for t in existing.collect() if t.template_id != template_id]
    rows.append((template_id, source))
    tbl.local_rows_df(spark, sorted(rows), _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tbl.p(index_dir, "search_templates"))


def list_templates(spark: SparkSession, index_dir: str) -> DataFrame:
    d = tbl.p(index_dir, "search_templates")
    if not os.path.isdir(d):
        return tbl.local_rows_df(spark, [], _SCHEMA)
    return spark.read.parquet(d)


def get_template(spark: SparkSession, index_dir: str, template_id: str) -> str:
    rows = list_templates(spark, index_dir).filter(
        f"template_id = '{template_id}'"
    ).collect()
    if not rows:
        raise KeyError(f"no search template {template_id!r} in {index_dir}")
    return rows[0].source


def render_stored(
    spark: SparkSession, index_dir: str, template_id: str, params: dict
) -> str:
    """ES _render/template over a stored id."""
    return render_template(get_template(spark, index_dir, template_id), params)


def msearch_template(
    spark: SparkSession,
    index_dir: str,
    requests: dict[str, tuple[str, dict]],
    k: int = 10,
    cfg=None,
    order_round: int | None = 4,
) -> DataFrame:
    """ES ``_msearch/template``: a batch of ``qid -> (template_id,
    params)`` requests rendered against the index's stored template store,
    then executed as ONE distributed msearch plan (the union of all
    rendered queries' postings decoded once — see bm25_topk_multi).
    Rendering is driver-side string work over the tiny template table;
    the search cost is identical to a plain _msearch of the same queries.
    Returns (qid, docid, score, rank)."""
    from ..operators.query import bm25_topk_multi

    queries = {
        str(qid): render_stored(spark, index_dir, tid, params)
        for qid, (tid, params) in requests.items()
    }
    return bm25_topk_multi(
        spark, index_dir, queries, k=k, cfg=cfg, order_round=order_round
    )
