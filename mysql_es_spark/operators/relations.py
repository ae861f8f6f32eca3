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
