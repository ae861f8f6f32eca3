"""Custom stateful streaming operator — gap sessionization.

The reference's streaming side has exactly one piece of state: the binlog
position cursor (SURVEY.md §2.10 ST7). This module shows the engine's
surface for *arbitrary* keyed streaming state — Structured Streaming's
``applyInPandasWithState`` with event-time timeouts — on the operation a
transcript/event pipeline actually needs: folding a per-user event stream
into sessions separated by > ``gap_sec`` of inactivity.

Semantics (deterministic, late-data-safe up to the watermark):
- events are grouped by ``user_id``; state = the currently-open session
  (start, last-event ts, event count);
- within a micro-batch, events are sorted by event time and gaps close
  sessions immediately;
- a session with no successor event closes when the watermark passes
  ``last + gap`` (EventTimeTimeout), so results don't depend on batch
  boundaries;
- state is in the checkpointed state store: a restarted query resumes
  open sessions exactly (the analog of the build's lineage resume).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long"
STATE_SCHEMA = "start long, last long, n long"
_US = 1_000_000  # state timestamps are stored as epoch-microseconds


def _sessionizer(gap_sec: int):
    gap_us = gap_sec * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed: list[tuple[Any, int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                s, last, n = state.get
                closed.append((user_id, s, last, n))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(int(t) for t in pdf["ts"].astype("int64") // 1000)
            ts_us.sort()
            if state.exists:
                s, last, n = state.get
            elif ts_us:
                s, last, n = ts_us[0], ts_us[0], 0
            else:  # no data and no state: nothing to do
                yield _frame([])
                return
            for t in ts_us:
                if n and t - last > gap_us:
                    closed.append((user_id, s, last, n))
                    s, n = t, 0
                elif not n:
                    s = min(s, t)
                last = max(last, t)
                n += 1
            state.update((s, last, n))
            # close via watermark: fire when no event lands for gap_sec
            state.setTimeoutTimestamp(last // 1000 + gap_sec * 1000)

        yield _frame(closed)

    return fn


def _frame(closed: list[tuple[Any, int, int, int]]) -> pd.DataFrame:
    """Typed output frame (explicit dtypes so empty frames convert cleanly)."""
    return pd.DataFrame(
        {
            "user_id": pd.Series([c[0] for c in closed], dtype="int64"),
            "session_start": pd.Series(
                [pd.Timestamp(c[1], unit="us") for c in closed], dtype="datetime64[us]"
            ),
            "session_end": pd.Series(
                [pd.Timestamp(c[2], unit="us") for c in closed], dtype="datetime64[us]"
            ),
            "n_events": pd.Series([c[3] for c in closed], dtype="int64"),
        }
    )


def sessionize_stream(events: DataFrame, gap_sec: int = 1800, watermark: str = "0 seconds") -> DataFrame:
    """Streaming (user_id, ts) events → closed sessions.

    ``events`` must be a streaming DataFrame with ``user_id`` (long) and
    ``ts`` (timestamp). Returns the append-mode stream of closed sessions;
    attach a sink with ``.writeStream``. One shuffle per micro-batch (the
    groupBy), state-store-backed like any Spark stateful op — scales by
    key cardinality, not stream length.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionizer(gap_sec),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
