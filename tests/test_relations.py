"""Relation-join operators (SURVEY.md §2.3) — enrich, rollup, flatten.

Mirrors the reference's relations/withs semantics: left-outer equi joins
with null-padding for misses (RelationRecords.fillRecords,
/root/reference/src/main/java/org/fly/sync/mysql/relation/
RelationRecords.java:118-150), multi-hop chains (user → user.extra), and
the nested-document attach + mix flatten (Record.java:208-211/263-289).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_es_spark import corpus
from mysql_es_spark.operators.relations import (
    conv_rollup,
    enrich_turns,
    mix_flatten,
    with_rollup,
)


@pytest.fixture(scope="module")
def parents(spark, tiny_transcripts):
    n_convs = tiny_transcripts.select("conv_id").distinct().count()
    cp, op = corpus.conversations_pdf(n_convs, seed=42)
    convs = spark.createDataFrame(
        cp,
        schema="conv_id string, title string, channel string, owner_id string, created_at timestamp",
    )
    owners = spark.createDataFrame(op, schema="owner_id string, name string, org string")
    return convs, owners


def test_enrich_nested_and_null_padding(spark, tiny_transcripts, parents):
    convs, owners = parents
    out = enrich_turns(tiny_transcripts, convs, owners, nested=True)
    # row-preserving left joins: every turn survives
    assert out.count() == tiny_transcripts.count()
    # nested attach: one struct column with an inner owner struct
    conv_field = out.schema["conv"].dataType
    assert conv_field.typeName() == "struct"
    assert conv_field["owner"].dataType.typeName() == "struct"
    # the generator drops ~3% of conv_ids from conversations: those turns
    # must appear with an all-null parent (Record.createNull analog)
    missing = out.filter(F.col("conv.title").isNull()).count()
    assert missing > 0
    # multi-hop: dangling owner FKs null-pad only the second hop
    dangling = out.filter(
        F.col("conv.title").isNotNull() & F.col("conv.owner.name").isNull()
    ).count()
    assert dangling > 0


def test_enrich_flat_matches_nested(spark, tiny_transcripts, parents):
    convs, owners = parents
    nested = enrich_turns(tiny_transcripts, convs, owners, nested=True)
    flat = enrich_turns(tiny_transcripts, convs, owners, nested=False)
    a = nested.select("conv_id", "turn_idx", F.col("conv.title").alias("t"))
    b = flat.select("conv_id", "turn_idx", F.col("conv_title").alias("t"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_mix_flatten_round_trip(spark, tiny_transcripts, parents):
    convs, owners = parents
    nested = enrich_turns(tiny_transcripts, convs, owners, nested=True)
    flat = mix_flatten(nested)
    assert "conv_title" in flat.columns and "conv_owner_name" in flat.columns
    assert all(f.dataType.typeName() != "struct" for f in flat.schema.fields)
    assert flat.count() == nested.count()


def test_conv_rollup_values(spark, tiny_transcripts):
    roll = conv_rollup(tiny_transcripts)
    # spot-check one conversation against a direct computation
    row = roll.orderBy("conv_id").first()
    sub = tiny_transcripts.filter(F.col("conv_id") == row["conv_id"])
    assert row["conv_n_turns"] == sub.count()
    assert row["conv_n_tool_turns"] == sub.filter(F.col("role") == "tool").count()


def test_with_rollup_preserves_rows_and_embeds(spark, tiny_transcripts):
    out = with_rollup(tiny_transcripts)
    assert out.count() == tiny_transcripts.count()
    # every turn of a conversation carries the same rollup values
    bad = (
        out.groupBy("conv_id")
        .agg(F.count_distinct("conv_n_turns").alias("k"))
        .filter(F.col("k") != 1)
        .count()
    )
    assert bad == 0
