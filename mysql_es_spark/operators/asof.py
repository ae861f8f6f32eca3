"""As-of (point-in-time) join — sort-merge over a single key shuffle.

The reference has no as-of join (SURVEY.md §2.3 "not present"); this is
one of the training-pipeline operators the engine adds: enrich an event
stream with the most recent dimension row at or before each event's
timestamp (feature stores, slowly-changing joins, market-data alignment).

Spark-first design — no per-row Python, no point lookups:

    union(left probe rows, right state rows)
      → shuffle once by key
      → sort (time, side) within the window
      → last(right payload, ignorenulls) over rows ≤ current
      → keep probe rows

which is exactly the textbook sort-merge as-of: one shuffle of
|L| + |R| rows, then a linear scan per key. At 100 TB both inputs
arrive hash-distributed by key; no broadcast, no range search, and the
window never materializes more than the running "current right row" per
key. A pathologically hot key serializes its own scan — pre-bucket such
keys by time range (the same range-salting used for head terms in
postings.py) if one key exceeds a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
) -> DataFrame:
    """Backward as-of left join: for each left row, attach ``payload``
    from the right row with the greatest ``right_time`` ≤ ``left_time``
    and matching key; nulls when no such row exists.

    Right rows must be unique per (key, time) — pre-aggregate otherwise
    (ties would make "the most recent row" ambiguous in any engine; DuckDB
    ASOF JOIN has the same requirement).
    """
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in payload]).alias("_p")).schema["_p"].dataType
        ).alias("_p"),
    )
    # SQL as-of semantics: a NULL key or NULL time on the build side can
    # never match (NULL = NULL and t <= NULL are both false) — drop such
    # rows here, or the window's last() would hand them to probe rows
    r = right.filter(
        F.col(right_key).isNotNull() & F.col(right_time).isNotNull()
    ).select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_l"].dataType).alias("_l"),
        F.struct(*[F.col(c) for c in payload]).alias("_p"),
    )
    # _side orders a right row *before* a left row at the same instant, so
    # right_time == left_time qualifies (the ≤ contract).
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r).withColumn("_match", F.last("_p", ignorenulls=True).over(w))
    out = merged.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.col("_match")[c].alias(c) for c in payload],
    )
    return out
