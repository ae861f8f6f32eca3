"""Relation joins — the reference's relations/withs subsystem, Spark-first.

mysql-es's dataflow engine (SURVEY.md §2.3, mysql/relation/
RelationRecords.java) does batched left-outer equi lookup joins with
multi-hop chaining, null-padding for misses, and nested-document attach
(Record.with → Record.mix, Record.java:208-211/263-289). On Spark the whole
subsystem is declarative joins:

- J1 distinct-FK semi-join build  → free (Catalyst builds the hash side)
- J2 batched IN probe             → the join itself (+ broadcast hint)
- J3 left-outer + null row        → ``how='left'`` (misses are nulls)
- J4 multi-hop chain              → chained joins (turns→convs→owners)
- J5 memoization                  → one plan node per join (free)
- J6 reverse propagation          → re-join changed parents + upsert

Nested attach is a ``struct()`` column; ``mix``-style flattening emits
dotted-name-equivalent flat columns (underscored — Spark-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_turns(
    turns: DataFrame, conversations: DataFrame, owners: DataFrame, nested: bool = True
) -> DataFrame:
    """turns ⟕ conversations ⟕ owners (multi-hop J3+J4).

    Conv-level parents are tiny relative to turns → broadcast both hops;
    no shuffle of the 10^12-row fact side. Misses null-pad exactly like
    Record.createNull (Record.java:48-57).
    """
    c = conversations.select(
        "conv_id",
        F.col("title").alias("conv_title"),
        F.col("channel").alias("conv_channel"),
        "owner_id",
        F.col("created_at").alias("conv_created_at"),
    )
    o = owners.select(
        "owner_id", F.col("name").alias("owner_name"), F.col("org").alias("owner_org")
    )
    joined = turns.join(F.broadcast(c), "conv_id", "left").join(
        F.broadcast(o), "owner_id", "left"
    )
    if not nested:
        return joined
    return joined.select(
        *turns.columns,
        F.struct(
            F.col("conv_title").alias("title"),
            F.col("conv_channel").alias("channel"),
            F.col("conv_created_at").alias("created_at"),
            F.struct(
                F.col("owner_name").alias("name"), F.col("owner_org").alias("org")
            ).alias("owner"),
        ).alias("conv"),
    )


def conv_rollup(turns: DataFrame) -> DataFrame:
    """Per-conversation aggregates to embed on each turn before indexing
    (the parent/child rollup the north_rule asks for)."""
    return turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("conv_n_turns"),
        F.min("ts").alias("conv_started_at"),
        F.max("ts").alias("conv_ended_at"),
        F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias("conv_n_tool_turns"),
        F.count_distinct("tool").alias("conv_n_tools"),
    )


def with_rollup(turns: DataFrame) -> DataFrame:
    """turns ⟕ conv_rollup — self-rollup join keyed on conv_id.

    At scale both sides shuffle on conv_id; AQE turns this into a local
    join when the rollup is small. The rollup is derived from turns so the
    partitioning can be reused (co-partitioned shuffle, no broadcast needed
    when the rollup is large)."""
    return turns.join(conv_rollup(turns), "conv_id", "left")


def mix_flatten(df: DataFrame, sep: str = "_") -> DataFrame:
    """Flatten struct columns to prefixed flat columns — the Spark analog
    of Record.mix's dotted-key flatten (Record.java:263-289)."""
    cols = []
    for f in df.schema.fields:
        if f.dataType.typeName() == "struct":
            for sub in f.dataType.fields:
                if sub.dataType.typeName() == "struct":
                    for sub2 in sub.dataType.fields:
                        cols.append(
                            F.col(f"{f.name}.{sub.name}.{sub2.name}").alias(
                                f"{f.name}{sep}{sub.name}{sep}{sub2.name}"
                            )
                        )
                else:
                    cols.append(F.col(f"{f.name}.{sub.name}").alias(f"{f.name}{sep}{sub.name}"))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def apply_withs(
    base: DataFrame,
    base_table: str,
    withs: list[str],
    relations: dict[str, dict[str, dict]],
    tables: dict[str, DataFrame],
    nested: bool = False,
    sep: str = "_",
    broadcast_dims: bool = True,
) -> DataFrame:
    """Config-driven multi-hop relation planner — the reference's
    ``relations``/``withs`` contract (River.java:184-228
    setCalledToAssociate, RelationRecords.java:51-60 relateBySubAssociate)
    compiled to chained Spark left-outer joins.

    ``relations`` declares, per table, named one-to-one lookups::

        {"comments": {"user":  {"table": "users",      "local": "uid",
                                "foreign": "id", "columns": ["*"],
                                "column_alias": {"nickname": "nick"}}},
         "users":    {"extra": {"table": "user_infos", "local": "id",
                                "foreign": "id"}}}

    ``withs`` lists dotted paths to attach to ``base`` ("user",
    "user.extra", ...). Exactly like the reference, each listed path
    contributes its LEAF table's columns, prefixed with the path
    (``user.extra`` alone adds user_extra_* columns but not user_*), and a
    missed key null-pads the attached columns (Record.createNull,
    Record.java:48-57). Shared path prefixes are resolved once
    (RelationRecords.loadedRelations memoization): "user" and
    "user.extra" probe the users table a single time.

    Scale: every hop is a lookup join against a dim table — broadcast by
    default (dims are small next to a 10^12-row fact table; set
    ``broadcast_dims=False`` to let AQE pick for large dims). The fact
    side is never shuffled on the broadcast path. ``nested=True``
    reassembles the path tree into struct columns (ES nested-doc parity);
    the flat default emits the reference's dotted columns with ``sep``.
    """
    for path in withs:
        head = path.split(".", 1)[0]
        if head not in relations.get(base_table, {}):
            raise KeyError(f"with '{path}': no relation '{head}' declared on '{base_table}'")

    # resolved path -> table at the leaf; parents before children, so every
    # needed prefix of a with is joined exactly once — silently (emitting
    # no user-visible columns) when the prefix is not itself listed
    resolved: dict[str, str] = {"": base_table}
    hidden: list[str] = []
    out = base
    need = sorted({".".join(w.split(".")[:i]) for w in withs
                   for i in range(1, w.count(".") + 2)},
                  key=lambda s: (s.count("."), s))
    listed = set(withs)
    for path in need:
        parent, _, leaf = path.rpartition(".")
        rel = relations.get(resolved[parent], {}).get(leaf)
        if rel is None:
            raise KeyError(f"with '{path}': no relation '{leaf}' declared on '{resolved[parent]}'")
        prefix = path.replace(".", sep)
        local = rel["local"] if parent == "" else f"__h{sep}{parent.replace('.', sep)}{sep}{rel['local']}"
        dim = tables[rel["table"]]
        cols = rel.get("columns", ["*"])
        if cols == ["*"] or "*" in cols:
            cols = dim.columns
        alias = rel.get("column_alias", {})
        # one probe per unique prefix carries BOTH this path's visible
        # columns (if listed) and, hidden, the local keys any child relation
        # declared on the leaf table will join through
        child_locals = sorted({r["local"] for r in relations.get(rel["table"], {}).values()})
        key_col = f"__k{sep}{prefix}"
        sel = [F.col(rel["foreign"]).alias(key_col)]
        sel += [F.col(c).alias(f"__h{sep}{prefix}{sep}{c}") for c in child_locals]
        hidden += [key_col] + [f"__h{sep}{prefix}{sep}{c}" for c in child_locals]
        if path in listed:
            sel += [F.col(c).alias(f"{prefix}{sep}{alias.get(c, c)}") for c in cols]
        rhs = dim.select(*sel).dropDuplicates([key_col])
        if broadcast_dims:
            rhs = F.broadcast(rhs)
        out = out.join(rhs, F.col(local) == F.col(key_col), "left")
        resolved[path] = rel["table"]
    out = out.drop(*hidden)
    if nested:
        out = _nest_withs(out, base.columns, withs, sep)
    return out


def _nest_withs(df: DataFrame, base_cols: list[str], withs: list[str], sep: str) -> DataFrame:
    """Regroup flat path-prefixed columns into per-top-segment structs
    (user_extra_city → user.extra.city), the ES nested-document shape."""
    tree: dict = {}
    for w in sorted(withs):
        node = tree
        for seg in w.split("."):
            node = node.setdefault(seg, {})

    def build(node: dict, prefix: str):
        fields = []
        flat = f"{prefix.replace('.', sep)}{sep}"
        for c in df.columns:
            if c.startswith(flat) and not any(
                c.startswith(f"{flat}{k}{sep}") for k in node
            ):
                fields.append(F.col(c).alias(c[len(flat):]))
        for k, sub in node.items():
            fields.append(build(sub, f"{prefix}.{k}" if prefix else k))
        return F.struct(*fields).alias(prefix.split(".")[-1])

    structs = [build(tree[top], top) for top in tree]
    return df.select(*base_cols, *structs)


def propagate_parent_update(
    docs: DataFrame, changed_parents: DataFrame, key: str, update_cols: list[str]
) -> DataFrame:
    """J6 reverse propagation as a deterministic join-update (the
    reference's async ES update-by-query, Writer.java:38-96, made exact):
    rows of ``docs`` whose ``key`` appears in ``changed_parents`` get the
    parent's new column values; all other rows pass through unchanged.
    Batch equivalent of MERGE INTO … WHEN MATCHED THEN UPDATE SET."""
    renamed = changed_parents.select(
        key, *[F.col(c).alias(f"__new_{c}") for c in update_cols]
    )
    out = docs.join(F.broadcast(renamed), key, "left")
    for c in update_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__new_{c}"), F.col(c))).drop(f"__new_{c}")
    return out
