from __future__ import annotations

from datetime import datetime

import pytest

from mysql_es_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2020-01-05 00:00:00")),  # between r1 and r2
            (2, 10, _ts("2020-01-10 00:00:00")),  # exactly at r2 (<= qualifies)
            (3, 10, _ts("2019-12-01 00:00:00")),  # before any right row
            (4, 20, _ts("2020-06-01 00:00:00")),  # key with no right rows
            (5, 10, _ts("2021-01-01 00:00:00")),  # after the last right row
        ],
        schema="event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2020-01-01 00:00:00"), "r1", 1.0),
            (10, _ts("2020-01-10 00:00:00"), "r2", 2.0),
            (30, _ts("2020-01-01 00:00:00"), "other", 9.0),
        ],
        schema="k long, rts timestamp, tag string, val double",
    )
    return left, right


def test_asof_backward_semantics(spark, frames):
    left, right = frames
    out = asof_join(left, right, "k", "k", "ts", "rts", ["tag", "val"])
    got = {r.event_id: (r.tag, r.val) for r in out.collect()}
    assert got[1] == ("r1", 1.0)  # most recent at-or-before
    assert got[2] == ("r2", 2.0)  # equal time qualifies
    assert got[3] == (None, None)  # nothing at-or-before
    assert got[4] == (None, None)  # unmatched key
    assert got[5] == ("r2", 2.0)  # sticks to the last right row
    assert out.count() == left.count()  # left join: every probe survives


def test_asof_null_keys_and_times_never_match(spark):
    left = spark.createDataFrame(
        [
            (1, None, _ts("2020-06-01 00:00:00")),  # null probe key
            (2, 10, None),  # null probe time: t <= NULL is false
            (3, 10, _ts("2020-06-01 00:00:00")),
        ],
        schema="event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (None, _ts("2020-01-01 00:00:00"), "nullkey"),
            (10, None, "nulltime"),
            (10, _ts("2020-01-01 00:00:00"), "good"),
        ],
        schema="k long, rts timestamp, tag string",
    )
    out = asof_join(left, right, "k", "k", "ts", "rts", ["tag"])
    got = {r.event_id: r.tag for r in out.collect()}
    assert got == {1: None, 2: None, 3: "good"}


def test_asof_keeps_left_columns_and_types(spark, frames):
    left, right = frames
    out = asof_join(left, right, "k", "k", "ts", "rts", ["val"])
    assert out.columns == ["event_id", "k", "ts", "val"]
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert dict(out.dtypes)["val"] == "double"
