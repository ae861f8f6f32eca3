"""Config-driven relation planner (apply_withs) — the reference's
relations/withs contract (River.java:184-228, RelationRecords.java:51-60)
as chained Spark left-outer joins. Fixture mirrors the reference's own
river.json example: comments -> users -> user_infos."""

from __future__ import annotations

from mysql_es_spark.operators.relations import apply_withs
from mysql_es_spark.sources.tables import local_rows_df

RELATIONS = {
    "comments": {
        "user": {"table": "users", "local": "uid", "foreign": "id"},
    },
    "users": {
        "extra": {"table": "user_infos", "local": "id", "foreign": "id"},
    },
}


def _tables(spark):
    comments = local_rows_df(
        spark,
        [(1, 10, "hi"), (2, 11, "yo"), (3, 99, "orphan")],
        "id long, uid long, content string",
    )
    users = local_rows_df(
        spark, [(10, "alice"), (11, "bob"), (12, "carol")], "id long, nickname string"
    )
    user_infos = local_rows_df(
        spark, [(10, "berlin"), (12, "tokyo")], "id long, city string"
    )
    return comments, {"users": users, "user_infos": user_infos}


def test_withs_two_hops_flat(spark):
    comments, tables = _tables(spark)
    out = apply_withs(
        comments, "comments", ["user", "user.extra"], RELATIONS, tables
    ).orderBy("id")
    rows = [r.asDict() for r in out.collect()]
    assert list(rows[0]) == [
        "id", "uid", "content", "user_id", "user_nickname", "user_extra_id", "user_extra_city"
    ]
    # full chain hit
    assert rows[0]["user_nickname"] == "alice" and rows[0]["user_extra_city"] == "berlin"
    # hop-1 hit, hop-2 miss -> null-padded leaf (Record.createNull analog)
    assert rows[1]["user_nickname"] == "bob" and rows[1]["user_extra_city"] is None
    # hop-1 miss -> everything downstream null
    assert rows[2]["user_id"] is None and rows[2]["user_extra_city"] is None


def test_withs_leaf_only_resolves_prefix_silently(spark):
    """Only 'user.extra' listed: user_* columns must NOT appear (the
    reference attaches only listed paths' columns) but the users hop still
    resolves the chain."""
    comments, tables = _tables(spark)
    out = apply_withs(comments, "comments", ["user.extra"], RELATIONS, tables)
    assert [c for c in out.columns if c.startswith("user")] == [
        "user_extra_id", "user_extra_city"
    ]
    got = {r["id"]: r["user_extra_city"] for r in out.collect()}
    assert got == {1: "berlin", 2: None, 3: None}


def test_withs_columns_and_alias(spark):
    comments, tables = _tables(spark)
    rels = {
        "comments": {
            "user": {
                "table": "users", "local": "uid", "foreign": "id",
                "columns": ["nickname"], "column_alias": {"nickname": "nick"},
            }
        }
    }
    out = apply_withs(comments, "comments", ["user"], rels, tables)
    assert [c for c in out.columns if c.startswith("user")] == ["user_nick"]


def test_withs_nested_structs(spark):
    comments, tables = _tables(spark)
    out = apply_withs(
        comments, "comments", ["user", "user.extra"], RELATIONS, tables, nested=True
    ).orderBy("id")
    rows = out.collect()
    assert rows[0]["user"]["nickname"] == "alice"
    assert rows[0]["user"]["extra"]["city"] == "berlin"
    assert rows[1]["user"]["extra"]["city"] is None


def test_withs_unknown_relation_raises(spark):
    comments, tables = _tables(spark)
    try:
        apply_withs(comments, "comments", ["nope"], RELATIONS, tables)
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_withs_broadcast_in_plan(spark):
    """broadcast_dims=True must actually put the dims on the broadcast
    side — the fact table is never shuffled."""
    comments, tables = _tables(spark)
    out = apply_withs(comments, "comments", ["user", "user.extra"], RELATIONS, tables)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
