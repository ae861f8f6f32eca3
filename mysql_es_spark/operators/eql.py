"""EQL-style sequence queries (ES Event Query Language ``sequence``).

The reference's rows land in Elasticsearch, where security/observability
users run EQL over them: ``sequence by key with maxspan=1h [p1] [p2] …``
finds ordered chains of events sharing a join key. Transcripts and
event logs are exactly that shape, so this engine exposes the same
primitive Spark-first.

Semantics (deterministic, existence-exact):
  a sequence match ending at event ``e_k`` exists iff there are events
  ``e_1 < e_2 < … < e_k`` (strictly, in the total (time, tiebreak)
  order) with the same join key, ``e_i`` satisfying step predicate
  ``p_i``, no ``until`` event strictly inside the chain's segment, and
  ``ts(e_k) - ts(e_1) <= maxspan``.

For each candidate end event we report the LATEST possible start
(backward-greedy maximal start), which minimizes the span — so the
maxspan filter is an exact existence test, not a greedy approximation:
if any chain ending at ``e_k`` fits in the span, the maximal-start one
does. Inductively, ``s_i(e) = max over p_{i-1} events e' < e of
s_{i-1}(e')`` computed as a running window max, which is the maximal
chain-start among ALL chains of steps ``1..i`` ending at ``e``.

Scale: every window (segment counter + one running max per step) shares
the same ``partitionBy(key) orderBy(time, tiebreak)`` spec, so Catalyst
plans ONE exchange + one sort for the whole chain regardless of the
number of steps; no per-row Python anywhere, no self-joins, no
key-count-sized driver state. Skewed keys cost what any window over
that key costs — at 10^12 events the sort is the price of the total
order the semantics require, and it is paid once.

ES EQL's ``until`` expels in-flight partial sequences when it fires;
here an ``until`` event increments a per-key segment counter and every
running max partitions by (key, segment), so no chain crosses it — the
exact same observable contract. The until event itself starts the next
segment (it can begin a new chain if it also matches step 1; ES
evaluates until first, so document accordingly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources import tables as tbl


def _as_col(pred: str | Column) -> Column:
    return F.expr(pred) if isinstance(pred, str) else pred


def sequence_matches(
    df: DataFrame,
    by: str | list[str],
    steps: list[str | Column],
    time_col: str = "ts",
    tiebreak: str | None = None,
    maxspan_seconds: float | None = None,
    until: str | Column | None = None,
    first_only: bool = False,
) -> DataFrame:
    """EQL ``sequence by <by> with maxspan=<s> [steps…] until [u]``.

    ``steps`` are SQL predicates (or Columns) over the event columns,
    one per sequence step, matched in order on strictly increasing
    (time_col, tiebreak) position within each ``by`` group. ``tiebreak``
    is required for a total order (pass the event id column); without
    one, equal timestamps would make matching nondeterministic.

    Returns one row per matching END event: the ``by`` columns,
    ``start_ts`` (latest-possible chain start — minimal span),
    ``end_ts``, ``span_seconds``, and ``end_<tiebreak>``. With
    ``first_only`` only the earliest qualifying end per key survives
    (EQL's one-match-per-key reporting mode).
    """
    if len(steps) < 2:
        raise ValueError("a sequence needs at least 2 steps")
    if tiebreak is None:
        raise ValueError("tiebreak column required for a deterministic total order")
    keys = [by] if isinstance(by, str) else list(by)
    order = [F.col(time_col).asc(), F.col(tiebreak).asc()]

    ev = df
    part = list(keys)
    if until is not None:
        # segment counter: chains may not cross an until event
        w_seg = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ev = ev.withColumn(
            "_seg",
            F.sum(F.when(_as_col(until), F.lit(1)).otherwise(F.lit(0))).over(w_seg),
        )
        part = keys + ["_seg"]

    w_prev = (
        Window.partitionBy(*part)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # s1: at step-1 events, the chain start is the event itself
    ev = ev.withColumn("_s1", F.when(_as_col(steps[0]), F.col(time_col)))
    for i in range(1, len(steps)):
        # s_{i+1}: at step-(i+1) events, the maximal start of any chain
        # of steps 1..i ending strictly before this row
        ev = ev.withColumn(
            f"_s{i + 1}",
            F.when(_as_col(steps[i]), F.max(f"_s{i}").over(w_prev)),
        )
    last = f"_s{len(steps)}"
    out = ev.filter(F.col(last).isNotNull()).select(
        *keys,
        F.col(last).alias("start_ts"),
        F.col(time_col).alias("end_ts"),
        # timestampdiff is timezone-free and accepts both TIMESTAMP and
        # TIMESTAMP_NTZ (ANSI mode forbids casting NTZ to a number)
        (
            F.expr(f"timestampdiff(MICROSECOND, {last}, {time_col})")
            / F.lit(1_000_000.0)
        ).alias("span_seconds"),
        F.col(tiebreak).alias(f"end_{tiebreak}"),
    )
    if maxspan_seconds is not None:
        out = out.filter(F.col("span_seconds") <= float(maxspan_seconds))
    if first_only:
        w_first = Window.partitionBy(*keys).orderBy(
            F.col("end_ts").asc(), F.col(f"end_{tiebreak}").asc()
        )
        out = (
            out.withColumn("_rn", F.row_number().over(w_first))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return out


def sample_matches(
    df: DataFrame,
    by: str | list[str],
    steps: list[str | Column],
    tiebreak: str | None = None,
    time_col: str = "ts",
) -> DataFrame:
    """EQL ``sample by <by> [p1] [p2] …``: keys where EVERY step predicate
    matched at least once, with one example event id per step — no
    ordering or span constraint (EQL's sample is the unordered sibling of
    sequence). The example is the earliest matching event per step in
    (time, tiebreak) order, which makes the output deterministic.

    ONE hash aggregate: per key, a conditional min over each step's
    matches (map-side combined), then an all-steps-present filter — no
    window, no self-joins, scale = one groupBy over the events."""
    if not steps:
        raise ValueError("sample needs at least 1 step")
    if tiebreak is None:
        raise ValueError("tiebreak column required for deterministic examples")
    keys = [by] if isinstance(by, str) else list(by)
    aggs = []
    for i, p in enumerate(steps, 1):
        pick = F.when(_as_col(p), F.struct(F.col(time_col), F.col(tiebreak)))
        aggs.append(F.min(pick).alias(f"_m{i}"))
    agg = df.groupBy(*keys).agg(*aggs)
    cond = None
    for i in range(1, len(steps) + 1):
        c = F.col(f"_m{i}").isNotNull()
        cond = c if cond is None else (cond & c)
    out_cols = [
        F.col(f"_m{i}")[tiebreak].alias(f"step{i}_{tiebreak}")
        for i in range(1, len(steps) + 1)
    ]
    return agg.filter(cond).select(*keys, *out_cols)


def event_query(
    df: DataFrame,
    predicate: str | Column,
    time_col: str = "ts",
    tiebreak: str | None = None,
    head: int | None = None,
) -> DataFrame:
    """EQL event query: ``<category> where <predicate>`` with optional
    ``| head N`` (earliest N in time order — a TakeOrdered, never a
    global sort)."""
    out = df.filter(_as_col(predicate))
    if head is not None:
        order = [F.col(time_col).asc()]
        if tiebreak is not None:
            order.append(F.col(tiebreak).asc())
        out = out.orderBy(*order).limit(int(head))
    return out
