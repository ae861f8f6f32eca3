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


class MissingStep:
    """Marker for an EQL 8.x missing-event step — ``![ pred ]`` in EQL
    syntax. Build with :func:`missing`."""

    def __init__(self, pred: str | Column):
        self.pred = pred


def missing(pred: str | Column) -> MissingStep:
    """``missing(pred)`` ≙ EQL's ``![ pred ]``: the sequence matches only
    if NO event satisfying ``pred`` occurs strictly between the
    surrounding positive steps (same key / segment)."""
    return MissingStep(pred)


def sequence_matches(
    df: DataFrame,
    by: str | list[str],
    steps: list,
    time_col: str = "ts",
    tiebreak: str | None = None,
    maxspan_seconds: float | None = None,
    until: str | Column | None = None,
    first_only: bool = False,
    head: int | None = None,
    tail: int | None = None,
) -> DataFrame:
    """EQL ``sequence by <by> with maxspan=<s> [steps…] until [u]``.

    ``steps`` are SQL predicates (or Columns) over the event columns,
    one per sequence step, matched in order on strictly increasing
    (time_col, tiebreak) position within each ``by`` group. ``tiebreak``
    is required for a total order (pass the event id column); without
    one, equal timestamps would make matching nondeterministic.

    A step may also be :func:`missing(pred) <missing>` — EQL 8.x's
    ``![ pred ]`` missing-event step: the chain transition across it is
    valid only when no ``pred`` event lies strictly between the two
    surrounding positive events. Implemented windowed, shuffle-free on
    top of the same (key, time) sort: a running count of missing-pred
    events turns "no missing event in the gap" into "same count", and
    the transition's running max runs over struct(count, start) — count
    is monotone, so the struct max picks the best start among exactly
    the rows after the last missing event (Spark's struct ordering puts
    a null start below any value, preserving "no chain" states).
    Missing steps must sit BETWEEN positive steps (ES requires leading/
    trailing missing events to carry their own maxspan clock; that
    variant is rejected here with a clear error).

    Returns one row per matching END event: the ``by`` columns,
    ``start_ts`` (latest-possible chain start — minimal span),
    ``end_ts``, ``span_seconds``, and ``end_<tiebreak>``. With
    ``first_only`` only the earliest qualifying end per key survives
    (EQL's one-match-per-key reporting mode). ``head``/``tail`` are
    EQL's sequence output pipes: globally earliest / latest N matches
    in (end_ts, end_<tiebreak>) order — each a TakeOrdered, never a
    full sort; both results come back ascending (the EQL contract)."""
    positives: list = []
    gaps: list[list] = []
    for s in steps:
        if isinstance(s, MissingStep):
            if not positives:
                raise ValueError(
                    "missing-event steps (![...]) must sit between two "
                    "positive steps — a leading missing event is not supported"
                )
            gaps[-1].append(s.pred)
        else:
            positives.append(s)
            gaps.append([])
    if gaps and gaps[-1]:
        raise ValueError(
            "missing-event steps (![...]) must sit between two positive "
            "steps — a trailing missing event is not supported"
        )
    gaps = gaps[:-1] if gaps else []
    if len(positives) < 2:
        raise ValueError("a sequence needs at least 2 positive steps")
    if head is not None and tail is not None:
        raise ValueError("head and tail pipes cannot be combined")
    if tiebreak is None:
        raise ValueError("tiebreak column required for a deterministic total order")
    steps = positives
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
    w_incl = (
        Window.partitionBy(*part)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # s1: at step-1 events, the chain start is the event itself
    ev = ev.withColumn("_s1", F.when(_as_col(steps[0]), F.col(time_col)))
    for i in range(1, len(steps)):
        if gaps and gaps[i - 1]:
            # missing-event transition: running count of missing-pred
            # events (inclusive — the previous positive event itself may
            # match the missing pred without sitting "between"); the
            # struct max picks the best start among rows sharing the
            # maximal count, i.e. rows after the last missing event
            miss = _as_col(gaps[i - 1][0])
            for extra in gaps[i - 1][1:]:
                miss = miss | _as_col(extra)
            ev = ev.withColumn(
                f"_mc{i}",
                F.sum(F.when(miss, F.lit(1)).otherwise(F.lit(0))).over(w_incl),
            )
            carried = F.max(
                F.struct(F.col(f"_mc{i}").alias("c"), F.col(f"_s{i}").alias("s"))
            ).over(w_prev).getField("s")
        else:
            carried = F.max(f"_s{i}").over(w_prev)
        # s_{i+1}: at step-(i+1) events, the maximal start of any chain
        # of steps 1..i ending strictly before this row
        ev = ev.withColumn(f"_s{i + 1}", F.when(_as_col(steps[i]), carried))
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
    tb = f"end_{tiebreak}"
    if head is not None:
        out = out.orderBy(F.col("end_ts").asc(), F.col(tb).asc()).limit(int(head))
    elif tail is not None:
        # latest N via TakeOrdered on the reversed order, re-sorted
        # ascending (N rows — the re-sort is driver-trivial)
        out = (
            out.orderBy(F.col("end_ts").desc(), F.col(tb).desc())
            .limit(int(tail))
            .orderBy(F.col("end_ts").asc(), F.col(tb).asc())
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
