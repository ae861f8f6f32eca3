"""EQL sequence queries: brute-force oracle + until/maxspan semantics."""

from __future__ import annotations

import itertools
import random
from datetime import datetime, timedelta

import pytest

from mysql_es_spark.operators.eql import event_query, sequence_matches
from mysql_es_spark.operators import eql

T0 = datetime(2024, 1, 1)


def _mk_events(seed, n, n_keys, types=("view", "click", "buy", "stop")):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                T0 + timedelta(seconds=rng.randrange(0, 3600)),
                rng.randrange(n_keys),
                rng.choice(types),
            )
        )
    return rows


def _brute(rows, steps, maxspan=None, until=None):
    """All (key, maximal start_ts, end event) matches, by enumeration."""
    bykey = {}
    for eid, ts, k, et in rows:
        bykey.setdefault(k, []).append((ts, eid, et))
    out = set()
    for k, evs in bykey.items():
        evs.sort()
        for endpos in range(len(evs)):
            if evs[endpos][2] not in steps[-1]:
                continue
            best = None
            for chain in itertools.combinations(range(endpos + 1), len(steps) - 1):
                pos = list(chain) + [endpos]
                if len(set(pos)) != len(pos) or sorted(pos) != pos:
                    continue
                if any(evs[p][2] not in steps[i] for i, p in enumerate(pos)):
                    continue
                start = evs[pos[0]][0]
                if best is None or start > best:
                    # segment check: no until strictly separating chain members
                    if until is None or not _crosses_until(evs, pos, until):
                        best = start
            if best is not None:
                span = (evs[endpos][0] - best).total_seconds()
                if maxspan is None or span <= maxspan:
                    out.add((k, best, evs[endpos][1]))
    return out


def _crosses_until(evs, pos, until):
    # engine contract: until events increment a segment counter at
    # themselves; a chain is valid iff all members share a segment
    seg = []
    c = 0
    for ts, eid, et in evs:
        if et in until:
            c += 1
        seg.append(c)
    return len({seg[p] for p in pos}) != 1


@pytest.fixture(scope="module")
def ev_df(spark):
    rows = _mk_events(13, 400, 8)
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ), rows


def test_sequence_matches_brute_force(spark, ev_df):
    df, rows = ev_df
    got = {
        (r.user_id, r.start_ts, r.end_event_id)
        for r in sequence_matches(
            df,
            "user_id",
            ["event_type = 'view'", "event_type = 'click'", "event_type = 'buy'"],
            tiebreak="event_id",
        ).collect()
    }
    want = _brute(rows, [{"view"}, {"click"}, {"buy"}])
    assert got == want
    assert len(got) > 0


def test_maxspan_is_exact_existence(spark, ev_df):
    df, rows = ev_df
    got = {
        (r.user_id, r.start_ts, r.end_event_id)
        for r in sequence_matches(
            df,
            "user_id",
            ["event_type = 'view'", "event_type = 'buy'"],
            tiebreak="event_id",
            maxspan_seconds=300,
        ).collect()
    }
    want = _brute(rows, [{"view"}, {"buy"}], maxspan=300)
    assert got == want
    # the filter really cut something
    assert len(got) < len(_brute(rows, [{"view"}, {"buy"}]))


def test_until_expels_partials(spark, ev_df):
    df, rows = ev_df
    got = {
        (r.user_id, r.start_ts, r.end_event_id)
        for r in sequence_matches(
            df,
            "user_id",
            ["event_type = 'view'", "event_type = 'buy'"],
            tiebreak="event_id",
            until="event_type = 'stop'",
        ).collect()
    }
    want = _brute(rows, [{"view"}, {"buy"}], until={"stop"})
    assert got == want
    assert len(got) < len(_brute(rows, [{"view"}, {"buy"}]))


def test_first_only_keeps_earliest_end(spark, ev_df):
    df, rows = ev_df
    full = sequence_matches(
        df,
        "user_id",
        ["event_type = 'view'", "event_type = 'click'"],
        tiebreak="event_id",
    ).collect()
    first = sequence_matches(
        df,
        "user_id",
        ["event_type = 'view'", "event_type = 'click'"],
        tiebreak="event_id",
        first_only=True,
    ).collect()
    bykey = {}
    for r in full:
        cur = bykey.get(r.user_id)
        if cur is None or (r.end_ts, r.end_event_id) < (cur.end_ts, cur.end_event_id):
            bykey[r.user_id] = r
    assert {(r.user_id, r.end_event_id) for r in first} == {
        (r.user_id, r.end_event_id) for r in bykey.values()
    }
    assert len(first) == len(bykey)


def test_requires_tiebreak_and_two_steps(spark, ev_df):
    df, _ = ev_df
    with pytest.raises(ValueError):
        sequence_matches(df, "user_id", ["event_type = 'view'"], tiebreak="event_id")
    with pytest.raises(ValueError):
        sequence_matches(df, "user_id", ["a = 1", "b = 2"])


def test_event_query_head(spark, ev_df):
    df, rows = ev_df
    got = [
        r.event_id
        for r in event_query(
            df, "event_type = 'buy'", tiebreak="event_id", head=5
        ).collect()
    ]
    want = [
        eid
        for ts, eid in sorted(
            (ts, eid) for eid, ts, k, et in rows if et == "buy"
        )[:5]
    ]
    assert got == want


def test_single_exchange_for_any_step_count(spark, ev_df):
    from tests.test_plan_audits import plan_of

    df, _ = ev_df
    out = sequence_matches(
        df,
        "user_id",
        ["event_type = 'view'", "event_type = 'click'", "event_type = 'buy'"],
        tiebreak="event_id",
        until="event_type = 'stop'",
        maxspan_seconds=600,
    )
    plan = plan_of(out)
    # the whole chain (segment counter + one running max per step) shares
    # one hash-partitioning: exactly one shuffle regardless of step count
    assert plan.count(") Exchange") == 1 and "hashpartitioning(user_id" in plan


def test_sample_matches_brute(spark, ev_df):
    from mysql_es_spark.operators.eql import sample_matches

    df, rows = ev_df
    out = sample_matches(
        df,
        "user_id",
        ["event_type = 'view'", "event_type = 'buy'", "event_type = 'stop'"],
        tiebreak="event_id",
    ).collect()
    bykey = {}
    for eid, ts, k, et in rows:
        bykey.setdefault(k, []).append((ts, eid, et))
    want = {}
    for k, evs in bykey.items():
        picks = []
        for step in ("view", "buy", "stop"):
            m = sorted((ts, eid) for ts, eid, et in evs if et == step)
            if not m:
                break
            picks.append(m[0][1])
        if len(picks) == 3:
            want[k] = tuple(picks)
    got = {r.user_id: (r.step1_event_id, r.step2_event_id, r.step3_event_id) for r in out}
    assert got == want and len(got) > 0


def test_sample_single_aggregate_plan(spark, ev_df):
    from tests.test_plan_audits import plan_of

    from mysql_es_spark.operators.eql import sample_matches

    df, _ = ev_df
    plan = plan_of(
        sample_matches(df, "user_id", ["event_type = 'view'", "event_type = 'buy'"],
                       tiebreak="event_id")
    )
    assert plan.count(") Exchange") == 1  # one partial+final agg, no window
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# round-3: missing-event steps (![...]) and head/tail sequence pipes
# ---------------------------------------------------------------------------


def _brute_missing(rows, s1, miss, s2, maxspan=None):
    """[s1] ![miss] [s2]: (key, max start, end id) with no miss event
    strictly between the chain's two members."""
    bykey = {}
    for eid, ts, k, et in rows:
        bykey.setdefault(k, []).append((ts, eid, et))
    out = set()
    for k, evs in bykey.items():
        evs.sort()
        for j, (ts2, eid2, et2) in enumerate(evs):
            if et2 not in s2:
                continue
            best = None
            for i in range(j):
                if evs[i][2] not in s1:
                    continue
                if any(evs[p][2] in miss for p in range(i + 1, j)):
                    continue
                if best is None or evs[i][0] > best:
                    best = evs[i][0]
            if best is not None and (maxspan is None or (ts2 - best).total_seconds() <= maxspan):
                out.add((k, best, eid2))
    return out


def test_missing_event_sequence_brute_force(spark, ev_df):
    df, rows = ev_df
    got = {
        (r.user_id, r.start_ts, r.end_event_id)
        for r in eql.sequence_matches(
            df,
            "user_id",
            ["event_type = 'view'", eql.missing("event_type = 'stop'"), "event_type = 'buy'"],
            tiebreak="event_id",
        ).collect()
    }
    want = _brute_missing(rows, {"view"}, {"stop"}, {"buy"})
    assert got == want and got  # nonempty

    # and the constraint actually bites vs the unconstrained sequence
    plain = {
        (r.user_id, r.start_ts, r.end_event_id)
        for r in eql.sequence_matches(
            df, "user_id", ["event_type = 'view'", "event_type = 'buy'"], tiebreak="event_id"
        ).collect()
    }
    assert got < plain


def test_missing_event_with_maxspan(spark, ev_df):
    df, rows = ev_df
    got = {
        (r.user_id, r.start_ts, r.end_event_id)
        for r in eql.sequence_matches(
            df,
            "user_id",
            ["event_type = 'view'", eql.missing("event_type = 'stop'"), "event_type = 'buy'"],
            tiebreak="event_id",
            maxspan_seconds=400,
        ).collect()
    }
    assert got == _brute_missing(rows, {"view"}, {"stop"}, {"buy"}, maxspan=400)


def test_missing_event_three_positives(spark, ev_df):
    """[view] ![stop] [click] [buy]: gap constraint on ONE transition only."""
    df, rows = ev_df
    got = {
        (r.user_id, r.start_ts, r.end_event_id)
        for r in eql.sequence_matches(
            df,
            "user_id",
            [
                "event_type = 'view'",
                eql.missing("event_type = 'stop'"),
                "event_type = 'click'",
                "event_type = 'buy'",
            ],
            tiebreak="event_id",
        ).collect()
    }
    # brute: chains view<click<buy, no stop between view and click,
    # maximal view start per buy end
    bykey = {}
    for eid, ts, k, et in rows:
        bykey.setdefault(k, []).append((ts, eid, et))
    want = set()
    for k, evs in bykey.items():
        evs.sort()
        for j, (tsb, eidb, etb) in enumerate(evs):
            if etb != "buy":
                continue
            best = None
            for c in range(j):
                if evs[c][2] != "click":
                    continue
                for v in range(c):
                    if evs[v][2] != "view":
                        continue
                    if any(evs[p][2] == "stop" for p in range(v + 1, c)):
                        continue
                    if best is None or evs[v][0] > best:
                        best = evs[v][0]
            if best is not None:
                want.add((k, best, eidb))
    assert got == want and got


def test_head_tail_pipes(spark, ev_df):
    df, _ = ev_df
    full = eql.sequence_matches(
        df, "user_id", ["event_type = 'view'", "event_type = 'buy'"], tiebreak="event_id"
    )
    allrows = sorted(
        ((r.end_ts, r.end_event_id, r.user_id) for r in full.collect())
    )
    head = eql.sequence_matches(
        df, "user_id", ["event_type = 'view'", "event_type = 'buy'"],
        tiebreak="event_id", head=5,
    ).collect()
    assert [(r.end_ts, r.end_event_id, r.user_id) for r in head] == allrows[:5]
    tail = eql.sequence_matches(
        df, "user_id", ["event_type = 'view'", "event_type = 'buy'"],
        tiebreak="event_id", tail=5,
    ).collect()
    assert [(r.end_ts, r.end_event_id, r.user_id) for r in tail] == allrows[-5:]


def test_missing_event_validation(spark, ev_df):
    df, _ = ev_df
    with pytest.raises(ValueError, match="leading"):
        eql.sequence_matches(
            df, "user_id",
            [eql.missing("event_type = 'stop'"), "event_type = 'buy'", "event_type = 'view'"],
            tiebreak="event_id",
        )
    with pytest.raises(ValueError, match="trailing"):
        eql.sequence_matches(
            df, "user_id",
            ["event_type = 'view'", "event_type = 'buy'", eql.missing("event_type = 'stop'")],
            tiebreak="event_id",
        )
    with pytest.raises(ValueError, match="head and tail"):
        eql.sequence_matches(
            df, "user_id", ["event_type = 'view'", "event_type = 'buy'"],
            tiebreak="event_id", head=1, tail=1,
        )
    with pytest.raises(ValueError, match="2 positive"):
        eql.sequence_matches(df, "user_id", ["event_type = 'view'"], tiebreak="event_id")
