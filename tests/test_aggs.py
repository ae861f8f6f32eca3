"""ES aggregations over the index — verified against a Python oracle.

Every agg must cover ALL docs matching the query (never top-k), mirror
ES's formulas (population moments, JLH), and tie-break deterministically.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators import aggs
from mysql_es_spark.operators.query import query_terms
from mysql_es_spark.oracle import build_oracle_index, score_query
from tests.conftest import TEST_CFG

Q = "w0 w3"


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = (
        spark.read.parquet(f"{built_index}/forward")
        .select("docid", "role", "tool", "ts", "text")
        .collect()
    )
    return {r.docid: r for r in rows}


@pytest.fixture(scope="module")
def matched(fwd):
    qt = set(query_terms(Q))
    return {d for d, r in fwd.items() if qt & set(tokenize_text(r.text))}


def test_date_histogram(spark, built_index, fwd, matched):
    want = Counter(fwd[d].ts.strftime("%Y-%m-%d") for d in matched)
    got = {
        r.period: r.n_docs
        for r in aggs.date_histogram(spark, built_index, Q, cfg=TEST_CFG).collect()
    }
    assert got == dict(want)


def test_histogram_dl(spark, built_index, fwd, matched):
    want = Counter((len(tokenize_text(fwd[d].text)) // 5) * 5 for d in matched)
    got = {
        r.bucket: r.n_docs
        for r in aggs.histogram(spark, built_index, Q, interval=5, cfg=TEST_CFG).collect()
    }
    assert got == dict(want)


def test_extended_stats(spark, built_index, fwd, matched):
    dls = np.array([len(tokenize_text(fwd[d].text)) for d in matched], dtype=np.float64)
    row = aggs.extended_stats(spark, built_index, Q, cfg=TEST_CFG).collect()[0]
    assert row.n_docs == len(dls)
    assert row.min_dl == int(dls.min()) and row.max_dl == int(dls.max())
    assert row.sum_dl == int(dls.sum())
    assert math.isclose(row.avg_dl, dls.mean(), rel_tol=1e-12)
    assert math.isclose(row.var_dl, dls.var(), rel_tol=1e-9)  # population
    assert math.isclose(row.std_dl, dls.std(), rel_tol=1e-9)


def test_cardinality_exact_and_approx(spark, built_index, fwd, matched):
    # ES cardinality skips missing values, as does count(DISTINCT col)
    want = len({fwd[d].tool for d in matched if fwd[d].tool is not None})
    got = aggs.cardinality(spark, built_index, Q, "tool", cfg=TEST_CFG).collect()[0]
    assert got.n_values == want
    approx = aggs.cardinality(
        spark, built_index, Q, "tool", cfg=TEST_CFG, exact=False, rsd=0.02
    ).collect()[0]
    assert abs(approx.n_values - want) <= max(2, int(0.1 * want))


def test_top_hits_per_role(spark, built_index, fwd):
    oix = build_oracle_index([(d, r.text) for d, r in fwd.items()])
    full = score_query(oix, Q, k=len(fwd))
    want: dict[str, list[int]] = {}
    for d, _s in full:  # already (score desc, docid asc)
        want.setdefault(fwd[d].role, []).append(d)
    want = {role: ids[:2] for role, ids in want.items()}
    out = aggs.top_hits(spark, built_index, Q, "role", size=2, cfg=TEST_CFG).collect()
    got: dict[str, list[int]] = {}
    for r in sorted(out, key=lambda r: (r.role, r.rank)):
        got.setdefault(r.role, []).append(r.docid)
    assert got == want
    scores = {(r.role, r.docid): r.score for r in out}
    exact = dict(full)
    for (role, d), s in scores.items():
        assert math.isclose(s, exact[d], abs_tol=1e-9)


def test_significant_terms_jlh(spark, built_index, fwd, matched):
    n_fg, n_bg = len(matched), len(fwd)
    fg_df: Counter = Counter()
    bg_df: Counter = Counter()
    for d, r in fwd.items():
        for t in set(tokenize_text(r.text)):
            bg_df[t] += 1
            if d in matched:
                fg_df[t] += 1
    want = []
    for t, f in fg_df.items():
        if f < 3:
            continue
        fgp, bgp = f / n_fg, bg_df[t] / n_bg
        if fgp > bgp:
            want.append((t, f, bg_df[t], (fgp - bgp) * (fgp / bgp)))
    want.sort(key=lambda x: (-round(x[3], 9), x[0]))
    got = aggs.significant_terms(spark, built_index, Q, size=8, cfg=TEST_CFG).collect()
    assert [(r.term, r.fg_df, r.bg_df) for r in got] == [w[:3] for w in want[:8]]
    for r, w in zip(got, want):
        assert math.isclose(r.jlh, w[3], rel_tol=1e-9)
    # the query's own terms must rank at/near the top — they define the set
    assert {"w0", "w3"} & {r.term for r in got}


def test_empty_query_schemas(spark, built_index):
    assert aggs.date_histogram(spark, built_index, "", cfg=TEST_CFG).count() == 0
    assert aggs.extended_stats(spark, built_index, "zzznope", cfg=TEST_CFG).count() == 0
    assert aggs.top_hits(spark, built_index, "", "role", cfg=TEST_CFG).columns == [
        "role",
        "docid",
        "score",
        "rank",
    ]


def test_percentiles(spark, built_index, fwd, matched):
    dls = sorted(len(tokenize_text(fwd[d].text)) for d in matched)

    def interp(p):
        # linear interpolation, the percentile()/quantile_cont contract
        idx = p * (len(dls) - 1)
        lo, hi = int(math.floor(idx)), int(math.ceil(idx))
        return dls[lo] + (dls[hi] - dls[lo]) * (idx - lo)

    got = aggs.percentiles(spark, built_index, Q, [0.25, 0.5, 0.9], cfg=TEST_CFG).collect()
    assert [r.pct for r in got] == [0.25, 0.5, 0.9]
    for r in got:
        assert math.isclose(r.value, interp(r.pct), rel_tol=1e-12), r
    approx = aggs.percentiles(
        spark, built_index, Q, [0.5], cfg=TEST_CFG, exact=False
    ).collect()[0]
    assert abs(approx.value - interp(0.5)) <= max(2.0, 0.1 * interp(0.5))


def test_range_agg(spark, built_index, fwd, matched):
    dls = {d: len(tokenize_text(fwd[d].text)) for d in matched}
    ranges = [(None, 20), (20, 60), (60, None), (10, 30)]  # overlapping OK

    def n_in(lo, hi):
        return sum(
            1
            for v in dls.values()
            if (lo is None or v >= lo) and (hi is None or v < hi)
        )

    got = {
        r.bucket: r.n_docs
        for r in aggs.range_agg(spark, built_index, Q, ranges, cfg=TEST_CFG).collect()
    }
    assert got == {
        "*-20": n_in(None, 20),
        "20-60": n_in(20, 60),
        "60-*": n_in(60, None),
        "10-30": n_in(10, 30),
    }
    assert sum(1 for v in got.values() if v) >= 3  # buckets genuinely used
    # empty-query: every requested bucket still present, count 0
    e = {r.bucket: r.n_docs for r in aggs.range_agg(spark, built_index, "", ranges, cfg=TEST_CFG).collect()}
    assert set(e) == set(got) and not any(e.values())


def test_filters_agg(spark, built_index, fwd, matched):
    flt = {
        "assistant": "role = 'assistant'",
        "user_late": "role = 'user' AND turn_idx >= 2",
        "never": "role = 'nope'",
    }
    got = {
        r.bucket: r.n_docs
        for r in aggs.filters_agg(spark, built_index, Q, flt, cfg=TEST_CFG).collect()
    }
    fwd_full = {
        r.docid: r
        for r in spark.read.parquet(f"{built_index}/forward")
        .select("docid", "role", "turn_idx")
        .collect()
    }
    want = {
        "assistant": sum(1 for d in matched if fwd_full[d].role == "assistant"),
        "user_late": sum(
            1 for d in matched if fwd_full[d].role == "user" and fwd_full[d].turn_idx >= 2
        ),
        "never": 0,
    }
    assert got == want
    assert want["assistant"] > 0 and want["user_late"] > 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        aggs.filters_agg(spark, built_index, Q, {}, cfg=TEST_CFG)


def test_composite_agg_pages(spark, built_index, fwd, matched):
    """Page through ALL role buckets one at a time with after-keys; the
    union of pages must equal the full group-by, order deterministic."""
    want = sorted(Counter(fwd[d].role for d in matched).items())
    assert len(want) >= 3  # multiple pages genuinely exercised
    pages, after = [], None
    while True:
        got = aggs.composite_agg(
            spark, built_index, Q, ["role"], size=1, after=after, cfg=TEST_CFG
        ).collect()
        if not got:
            break
        pages.extend((r.role, r.n_docs) for r in got)
        after = (got[-1].role,)
    assert pages == want


def test_composite_agg_nulls_first(spark, built_index, fwd, matched):
    """A nullable source (tool) sorts nulls first on the first page, and
    an after-key past the null prefix never resurfaces it."""
    got = aggs.composite_agg(
        spark, built_index, Q, ["tool"], size=50, cfg=TEST_CFG
    ).collect()
    want = Counter(fwd[d].tool for d in matched)
    keys = [r.tool for r in got]
    assert keys[0] is None and None not in keys[1:]
    assert {(r.tool, r.n_docs) for r in got} == set(want.items())
    after = (keys[1],)  # first non-null bucket
    page2 = aggs.composite_agg(
        spark, built_index, Q, ["tool"], size=50, after=after, cfg=TEST_CFG
    ).collect()
    assert [r.tool for r in page2] == keys[2:]


def test_composite_agg_first_page_and_validation(spark, built_index, fwd, matched):
    got = aggs.composite_agg(
        spark, built_index, Q, ["role"], size=2, cfg=TEST_CFG
    ).collect()
    rows = Counter(fwd[d].role for d in matched)
    want = sorted(rows.items())[:2]
    assert [(r.role, r.n_docs) for r in got] == want
    with pytest.raises(ValueError):
        aggs.composite_agg(spark, built_index, Q, ["role", "tool"], after=("x",), cfg=TEST_CFG)


def test_range_agg_label_collision_and_floats(spark, built_index):
    with pytest.raises(ValueError):
        aggs.range_agg(
            spark, built_index, Q, [(60, 90), (60.5, 90.2)][:1] + [(60.0, 90.0)],
            cfg=TEST_CFG,
        )
    got = aggs.range_agg(
        spark, built_index, Q, [(60, 90), (60.5, 90.2)], cfg=TEST_CFG
    ).collect()
    assert {r.bucket for r in got} == {"60-90", "60.5-90.2"}


def test_aggs_zero_live_matches_count_zero(spark, built_index, tmp_path):
    """All matching docs soft-deleted: buckets must report 0, not NULL."""
    import shutil

    from mysql_es_spark.operators.query import invalidate_stats_cache
    from mysql_es_spark.plans.deletes import delete_by_query

    ix = str(tmp_path / "ixz")
    shutil.copytree(built_index, ix)
    delete_by_query(spark, ix, "w0", cfg=TEST_CFG)
    invalidate_stats_cache(ix)
    got = aggs.range_agg(spark, ix, "w0", [(None, 20), (20, None)], cfg=TEST_CFG).collect()
    assert [(r.bucket, r.n_docs) for r in got] == [("*-20", 0), ("20-*", 0)]
    gf = aggs.filters_agg(spark, ix, "w0", {"a": "role = 'user'"}, cfg=TEST_CFG).collect()
    assert [(r.bucket, r.n_docs) for r in gf] == [("a", 0)]


def test_composite_empty_page_keeps_types(spark, built_index):
    """Unknown-term query: the empty page must carry the forward table's
    REAL column types (long turn_idx), not strings."""
    df = aggs.composite_agg(spark, built_index, "zzzyqq", ["turn_idx"], cfg=TEST_CFG)
    assert df.count() == 0
    assert dict(df.dtypes)["turn_idx"] == "int"


def test_pipeline_agg(spark, built_index, fwd, matched):
    hist = Counter(fwd[d].ts.strftime("%Y-%m-%d") for d in matched)
    periods = sorted(hist)
    rows = aggs.pipeline_agg(
        spark, built_index, Q, window=2,
        script="cast(n_docs as double) / cum_docs", cfg=TEST_CFG,
    ).collect()
    assert [r.period for r in rows] == periods
    cum, prev = 0, None
    for i, p in enumerate(periods):
        n = hist[p]
        cum += n
        r = rows[i]
        assert (r.n_docs, r.cum_docs) == (n, cum)
        assert r.deriv == (None if prev is None else n - prev)
        wnd = [hist[q] for q in periods[max(0, i - 2):i]]
        if wnd:
            assert abs(r.moving_avg - sum(wnd) / len(wnd)) < 1e-9
        else:
            assert r.moving_avg is None
        assert abs(r.script_val - n / cum) < 1e-9
        prev = n


def test_pipeline_agg_selector_runs_last(spark, built_index):
    full = aggs.pipeline_agg(spark, built_index, Q, cfg=TEST_CFG).collect()
    kept = aggs.pipeline_agg(spark, built_index, Q, selector="deriv > 0", cfg=TEST_CFG).collect()
    want = [r for r in full if r.deriv is not None and r.deriv > 0]
    # dropped buckets still fed their neighbours' windows: surviving rows
    # carry the same cum/moving values they had in the unfiltered stream
    assert [(r.period, r.cum_docs, r.moving_avg) for r in kept] == [
        (r.period, r.cum_docs, r.moving_avg) for r in want
    ]
    with pytest.raises(ValueError):
        aggs.pipeline_agg(spark, built_index, Q, window=0, cfg=TEST_CFG)


def test_pipeline_agg_empty_query(spark, built_index):
    out = aggs.pipeline_agg(spark, built_index, "zzznotaterm", cfg=TEST_CFG)
    assert out.count() == 0
    assert set(out.columns) == {"period", "n_docs", "cum_docs", "deriv", "moving_avg"}


# ---------------------------------------------------------------------------
# round-2 continuation: date_range / multi_terms / rare_terms /
# adjacency_matrix / weighted_avg / diversified_sampler / bucket pipeline


def test_date_range_agg(spark, built_index, fwd, matched):
    ts = sorted(fwd[d].ts for d in matched)
    lo = ts[len(ts) // 3].strftime("%Y-%m-%d %H:%M:%S")
    hi = ts[2 * len(ts) // 3].strftime("%Y-%m-%d %H:%M:%S")
    ranges = [(None, lo), (lo, hi), (hi, None), (lo, None)]
    got = {
        r.bucket: r.n_docs
        for r in aggs.date_range_agg(spark, built_index, Q, ranges, cfg=TEST_CFG).collect()
    }

    def cnt(a, b):
        return sum(
            1
            for d in matched
            if (a is None or str(fwd[d].ts) >= a) and (b is None or str(fwd[d].ts) < b)
        )

    want = {f"{a or '*'}-{b or '*'}": cnt(a, b) for a, b in ranges}
    assert got == want
    # overlap: the half-open [lo,*) bucket equals [lo,hi) + [hi,*)
    assert got[f"{lo}-*"] == got[f"{lo}-{hi}"] + got[f"{hi}-*"]


def test_multi_terms_agg(spark, built_index, fwd, matched):
    want = Counter(
        (fwd[d].role, fwd[d].tool)
        for d in matched
        if fwd[d].role is not None and fwd[d].tool is not None
    )
    order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = aggs.multi_terms_agg(
        spark, built_index, Q, ["role", "tool"], size=5, cfg=TEST_CFG
    ).collect()
    assert [((r.role, r.tool), r.n_docs) for r in got] == order


def test_rare_terms_agg(spark, built_index, fwd, matched):
    c = Counter(fwd[d].tool for d in matched if fwd[d].tool is not None)
    mx = sorted(c.values())[max(0, len(c) // 2 - 1)] if c else 1
    want = sorted(((v, k) for k, v in c.items() if v <= mx))
    got = aggs.rare_terms_agg(spark, built_index, Q, "tool", max_doc_count=mx, cfg=TEST_CFG)
    assert [(r.n_docs, r.tool) for r in got.collect()] == want
    assert all(n <= mx for n, _ in want)


def test_adjacency_matrix_agg(spark, built_index, fwd, matched):
    filt = {
        "a_user": "role = 'user'",
        "b_asst": "role = 'assistant'",
        "c_tool": "tool IS NOT NULL",
    }
    rows = {r.bucket: r.n_docs for r in
            aggs.adjacency_matrix_agg(spark, built_index, Q, filt, cfg=TEST_CFG).collect()}

    def n(pred):
        return sum(1 for d in matched if pred(fwd[d]))

    want = {
        "a_user": n(lambda r: r.role == "user"),
        "b_asst": n(lambda r: r.role == "assistant"),
        "c_tool": n(lambda r: r.tool is not None),
        "a_user&b_asst": 0,  # roles are exclusive -> bucket dropped
        "a_user&c_tool": n(lambda r: r.role == "user" and r.tool is not None),
        "b_asst&c_tool": n(lambda r: r.role == "assistant" and r.tool is not None),
    }
    want = {k: v for k, v in want.items() if v > 0}  # ES drops empty buckets
    assert rows == want


def test_weighted_avg_agg(spark, built_index, fwd, matched):
    qt = query_terms(Q)
    num = den = 0
    for d in matched:
        toks = tokenize_text(fwd[d].text)
        w = sum(toks.count(t) for t in qt)
        num += w * len(toks)
        den += w
    row = aggs.weighted_avg_agg(spark, built_index, Q, cfg=TEST_CFG).collect()[0]
    assert row.n_docs == len(matched)
    assert row.sum_weight == den
    assert math.isclose(row.weighted_avg_dl, round(num / den, 6), rel_tol=1e-9)


def test_diversified_sampler_agg(spark, built_index, fwd, matched):
    shard, cap = 40, 2
    keys = {
        r.docid: (r.conv_id, r.turn_idx)
        for r in spark.read.parquet(f"{built_index}/forward")
        .select("docid", "conv_id", "turn_idx")
        .collect()
    }
    seen: Counter = Counter()
    sample = []
    for d in sorted(matched, key=lambda d: keys[d]):  # document order
        key = fwd[d].role
        if key is None:
            continue
        seen[key] += 1
        if seen[key] <= cap:
            sample.append(d)
    sample = sample[:shard]
    want = Counter(fwd[d].tool for d in sample if fwd[d].tool is not None)
    order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    got = aggs.diversified_sampler_agg(
        spark, built_index, Q, "role", "tool",
        shard_size=shard, max_docs_per_value=cap, cfg=TEST_CFG,
    ).collect()
    assert [(r.tool, r.n_docs) for r in got] == order
    # the per-value cap actually bit: no role exceeds it in the sample
    assert max(Counter(fwd[d].role for d in sample).values()) <= cap


def test_bucket_sort_agg(spark, built_index):
    hist = {
        r.period: r.n_docs
        for r in aggs.date_histogram(spark, built_index, Q, cfg=TEST_CFG).collect()
    }
    want = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))
    got = aggs.bucket_sort_agg(spark, built_index, Q, size=3, cfg=TEST_CFG).collect()
    assert [(r.period, r.n_docs) for r in got] == want[:3]
    page2 = aggs.bucket_sort_agg(spark, built_index, Q, size=3, offset=3, cfg=TEST_CFG).collect()
    assert [(r.period, r.n_docs) for r in page2] == want[3:6]


def test_serial_diff_agg(spark, built_index):
    hist = aggs.date_histogram(spark, built_index, Q, cfg=TEST_CFG).collect()
    lag = 2
    got = aggs.serial_diff_agg(spark, built_index, Q, lag=lag, cfg=TEST_CFG).collect()
    assert [r.period for r in got] == [r.period for r in hist]
    for i, r in enumerate(got):
        want = None if i < lag else hist[i].n_docs - hist[i - lag].n_docs
        assert r.diff == want
    with pytest.raises(ValueError):
        aggs.serial_diff_agg(spark, built_index, Q, lag=0, cfg=TEST_CFG)


def test_stats_bucket_agg(spark, built_index):
    hist = [
        (r.period, r.n_docs)
        for r in aggs.date_histogram(spark, built_index, Q, cfg=TEST_CFG).collect()
    ]
    ns = [n for _, n in hist]
    row = aggs.stats_bucket_agg(spark, built_index, Q, cfg=TEST_CFG).collect()[0]
    assert row.n_buckets == len(ns)
    assert row.sum_docs == sum(ns)
    assert row.min_docs == min(ns) and row.max_docs == max(ns)
    assert math.isclose(row.avg_docs, round(sum(ns) / len(ns), 6), rel_tol=1e-9)
    assert row.min_period == min(p for p, n in hist if n == min(ns))
    assert row.max_period == min(p for p, n in hist if n == max(ns))


def test_new_aggs_empty_query(spark, built_index):
    assert aggs.multi_terms_agg(spark, built_index, "zzznotaterm", ["role"], cfg=TEST_CFG).count() == 0
    assert aggs.rare_terms_agg(spark, built_index, "zzznotaterm", "tool", cfg=TEST_CFG).count() == 0
    dr = aggs.date_range_agg(
        spark, built_index, "zzznotaterm", [(None, "2026-01-01 00:00:00")], cfg=TEST_CFG
    ).collect()
    assert [(r.bucket, r.n_docs) for r in dr] == [("*-2026-01-01 00:00:00", 0)]
    assert aggs.adjacency_matrix_agg(
        spark, built_index, "zzznotaterm", {"a": "role = 'user'"}, cfg=TEST_CFG
    ).count() == 0
    assert aggs.weighted_avg_agg(spark, built_index, "zzznotaterm", cfg=TEST_CFG).count() == 0


def test_global_agg(spark, built_index):
    from mysql_es_spark.operators.aggs import global_agg
    from mysql_es_spark.operators.query import bm25_topk

    dls = {
        r.docid: r.dl
        for r in spark.read.parquet(f"{built_index}/doc_lens").collect()
    }
    matched = {
        r.docid
        for r in bm25_topk(
            spark, built_index, "w0 w3", k=10**6, cfg=TEST_CFG, mode="simple"
        ).collect()
    }
    row = global_agg(spark, built_index, "w0 w3", cfg=TEST_CFG).collect()[0]
    assert row.n_total == len(dls)
    assert row.n_matched == len(matched)
    assert row.avg_dl_total == pytest.approx(sum(dls.values()) / len(dls))
    assert row.avg_dl_matched == pytest.approx(
        sum(dls[d] for d in matched) / len(matched)
    )
    empty = global_agg(spark, built_index, "zzznope", cfg=TEST_CFG).collect()[0]
    assert empty.n_matched == 0 and empty.avg_dl_matched is None
    assert empty.n_total == len(dls)


def test_missing_agg(spark, built_index):
    from mysql_es_spark.operators.aggs import missing_agg
    from mysql_es_spark.operators.query import bm25_topk

    fwd = spark.read.parquet(f"{built_index}/forward").select("docid", "tool").collect()
    tool_of = {r.docid: r.tool for r in fwd}
    matched = {
        r.docid
        for r in bm25_topk(
            spark, built_index, "w0 w3", k=10**6, cfg=TEST_CFG, mode="simple"
        ).collect()
    }
    n_missing = sum(1 for d in matched if tool_of[d] is None)
    assert 0 < n_missing < len(matched), "fixture must mix null and set tools"
    row = missing_agg(spark, built_index, "w0 w3", "tool", cfg=TEST_CFG).collect()[0]
    assert row.n_matched == len(matched)
    assert row.n_missing == n_missing


def test_percentile_ranks(spark, built_index):
    from mysql_es_spark.operators.aggs import percentile_ranks
    from mysql_es_spark.operators.query import bm25_topk

    dls = {
        r.docid: r.dl
        for r in spark.read.parquet(f"{built_index}/doc_lens").collect()
    }
    matched = {
        r.docid
        for r in bm25_topk(
            spark, built_index, "w0 w3", k=10**6, cfg=TEST_CFG, mode="simple"
        ).collect()
    }
    vals = [3.0, 7.0, 100000.0]
    got = percentile_ranks(spark, built_index, "w0 w3", vals, cfg=TEST_CFG).collect()
    assert [r.value for r in got] == vals
    for r in got:
        want = 100.0 * sum(1 for d in matched if dls[d] <= r.value) / len(matched)
        assert r.pct == pytest.approx(want)
    assert got[-1].pct == 100.0


def test_top_metrics(spark, built_index):
    from mysql_es_spark.operators.aggs import top_metrics
    from mysql_es_spark.operators.query import bm25_topk

    fwd = {
        r.docid: r.ts
        for r in spark.read.parquet(f"{built_index}/forward").select("docid", "ts").collect()
    }
    dls = {
        r.docid: r.dl
        for r in spark.read.parquet(f"{built_index}/doc_lens").collect()
    }
    matched = {
        r.docid
        for r in bm25_topk(
            spark, built_index, "w0 w3", k=10**6, cfg=TEST_CFG, mode="simple"
        ).collect()
    }
    want_doc = sorted(matched, key=lambda d: (fwd[d], -d), reverse=True)[0]
    row = top_metrics(spark, built_index, "w0 w3", "ts", ("dl",), cfg=TEST_CFG).collect()[0]
    assert row.docid == want_doc
    assert row.dl == dls[want_doc]


def test_value_count(spark, built_index, fwd, matched):
    want = sum(1 for d in matched if fwd[d].tool is not None)
    row = aggs.value_count(spark, built_index, Q, "tool", cfg=TEST_CFG).collect()[0]
    assert row.field == "tool" and row.n_values == want


def test_median_absolute_deviation(spark, built_index, fwd, matched):
    dls = np.array([len(tokenize_text(fwd[d].text)) for d in matched], dtype=np.float64)
    med = np.percentile(dls, 50)  # linear interpolation, same as F.percentile
    want = np.percentile(np.abs(dls - med), 50)
    row = aggs.median_absolute_deviation(spark, built_index, Q, cfg=TEST_CFG).collect()[0]
    assert math.isclose(row.mad, want, rel_tol=1e-9)


def test_boxplot(spark, built_index, fwd, matched):
    dls = np.array([len(tokenize_text(fwd[d].text)) for d in matched], dtype=np.float64)
    row = aggs.boxplot_agg(spark, built_index, Q, cfg=TEST_CFG).collect()[0]
    assert row.min_dl == int(dls.min()) and row.max_dl == int(dls.max())
    for got, q in ((row.q1, 25), (row.q2, 50), (row.q3, 75)):
        assert math.isclose(got, np.percentile(dls, q), rel_tol=1e-9)


def test_string_stats(spark, built_index, fwd, matched):
    texts = [fwd[d].text for d in matched]
    lens = [len(t) for t in texts]
    pooled = Counter("".join(texts))
    total = sum(pooled.values())
    ent = -sum((c / total) * math.log2(c / total) for c in pooled.values())
    row = aggs.string_stats(spark, built_index, Q, cfg=TEST_CFG).collect()[0]
    assert row.n_values == len(texts)
    assert row.min_len == min(lens) and row.max_len == max(lens)
    assert math.isclose(row.avg_len, sum(lens) / len(lens), rel_tol=1e-12)
    assert math.isclose(row.entropy, ent, rel_tol=1e-9)


def test_sampler_agg(spark, built_index, fwd):
    oix = build_oracle_index([(d, r.text) for d, r in fwd.items()])
    top = [d for d, _ in score_query(oix, Q, k=25)]
    dls = [len(tokenize_text(fwd[d].text)) for d in top]
    row = aggs.sampler_agg(spark, built_index, Q, shard_size=25, cfg=TEST_CFG).collect()[0]
    assert row.n_docs == len(top)
    assert row.min_dl == min(dls) and row.max_dl == max(dls)
    assert math.isclose(row.avg_dl, sum(dls) / len(dls), rel_tol=1e-12)


def _hour_hist(fwd, matched):
    return Counter(fwd[d].ts.strftime("%Y-%m-%d %H:00:00") for d in matched)


def test_percentiles_bucket(spark, built_index, fwd, matched):
    vals = np.array(sorted(_hour_hist(fwd, matched).values()), dtype=np.float64)
    got = aggs.percentiles_bucket_agg(
        spark, built_index, Q, interval="hour", percents=(25.0, 50.0, 90.0), cfg=TEST_CFG
    ).collect()
    assert [r.pct for r in got] == [25.0, 50.0, 90.0]
    for r in got:
        assert math.isclose(r.value, np.percentile(vals, r.pct), rel_tol=1e-9)


def test_normalize_agg(spark, built_index, fwd, matched):
    hist = _hour_hist(fwd, matched)
    tot = sum(hist.values())
    got = {
        r.period: r.value
        for r in aggs.normalize_agg(
            spark, built_index, Q, interval="hour", cfg=TEST_CFG
        ).collect()
    }
    assert got.keys() == set(hist)
    for p, v in got.items():
        assert math.isclose(v, hist[p] / tot * 100.0, rel_tol=1e-12)
    vals = np.array(list(hist.values()), dtype=np.float64)
    gz = {
        r.period: r.value
        for r in aggs.normalize_agg(
            spark, built_index, Q, interval="hour", method="z-score", cfg=TEST_CFG
        ).collect()
    }
    for p, v in gz.items():
        assert math.isclose(v, (hist[p] - vals.mean()) / vals.std(), rel_tol=1e-9)
    ex = np.exp(vals - vals.max())
    sm = {v: e / ex.sum() for v, e in zip(hist.values(), ex)}
    gs = {
        r.period: r.value
        for r in aggs.normalize_agg(
            spark, built_index, Q, interval="hour", method="softmax", cfg=TEST_CFG
        ).collect()
    }
    for p, v in gs.items():
        assert math.isclose(v, sm[hist[p]], rel_tol=1e-9)
    with pytest.raises(ValueError):
        aggs.normalize_agg(spark, built_index, Q, method="nope", cfg=TEST_CFG)


def test_cumulative_cardinality(spark, built_index, fwd, matched):
    periods = sorted(_hour_hist(fwd, matched))
    seen: set = set()
    want = {}
    for p in periods:
        for d in matched:
            if fwd[d].ts.strftime("%Y-%m-%d %H:00:00") == p and fwd[d].tool is not None:
                seen.add(fwd[d].tool)
        want[p] = len(seen)
    got = aggs.cumulative_cardinality_agg(
        spark, built_index, Q, field="tool", interval="hour", cfg=TEST_CFG
    ).collect()
    assert [r.period for r in got] == periods
    hist = _hour_hist(fwd, matched)
    for r in got:
        assert r.n_docs == hist[r.period]
        assert r.cum_unique == want[r.period], (r.period, r.cum_unique, want[r.period])


def test_matrix_stats(spark, built_index, fwd, matched):
    x = np.array([len(tokenize_text(fwd[d].text)) for d in matched], dtype=np.float64)
    y = np.array([len(fwd[d].text) for d in matched], dtype=np.float64)
    r = aggs.matrix_stats_agg(spark, built_index, Q, cfg=TEST_CFG).collect()[0]
    assert r.n == len(x)
    assert math.isclose(r.mean_x, x.mean(), rel_tol=1e-12)
    assert math.isclose(r.var_x, x.var(), rel_tol=1e-9)
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    assert math.isclose(r.skew_x, m3 / x.var() ** 1.5, rel_tol=1e-7)
    assert math.isclose(r.kurt_x, m4 / x.var() ** 2, rel_tol=1e-7)
    assert math.isclose(r.mean_y, y.mean(), rel_tol=1e-12)
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    assert math.isclose(r.cov_xy, cov, rel_tol=1e-9)
    assert math.isclose(r.corr_xy, cov / (x.std() * y.std()), rel_tol=1e-9)


def test_t_test(spark, built_index, fwd):
    qa, qb = "w0 w3", "w1"
    def dls(q):
        qt = set(query_terms(q))
        return np.array(
            [len(tokenize_text(r.text)) for r in fwd.values() if qt & set(tokenize_text(r.text))],
            dtype=np.float64,
        )
    a, b = dls(qa), dls(qb)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    na, nb = len(a), len(b)
    r = aggs.t_test_agg(spark, built_index, qa, qb, cfg=TEST_CFG).collect()[0]
    assert (r.n_a, r.n_b) == (na, nb)
    se2 = va / na + vb / nb
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert math.isclose(r.t, t, rel_tol=1e-9)
    assert math.isclose(r.df, df, rel_tol=1e-9)
    rh = aggs.t_test_agg(spark, built_index, qa, qb, mode="homoscedastic", cfg=TEST_CFG).collect()[0]
    sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    th = (a.mean() - b.mean()) / math.sqrt(sp2 * (1 / na + 1 / nb))
    assert math.isclose(rh.t, th, rel_tol=1e-9)
    assert rh.df == na + nb - 2
    with pytest.raises(ValueError):
        aggs.t_test_agg(spark, built_index, qa, qb, mode="paired", cfg=TEST_CFG)


def test_rate_agg(spark, built_index, fwd, matched):
    hist = _hour_hist(fwd, matched)
    got = aggs.rate_agg(
        spark, built_index, Q, interval="hour", unit="minute", cfg=TEST_CFG
    ).collect()
    assert {r.period for r in got} == set(hist)
    for r in got:
        assert math.isclose(r.rate, hist[r.period] * 60.0 / 3600.0, rel_tol=1e-12)
    # calendar bucket: one January month bucket, 31 days, per-day rate
    gm = aggs.rate_agg(
        spark, built_index, Q, interval="month", unit="day", cfg=TEST_CFG
    ).collect()
    assert len(gm) == 1 and gm[0].period == "2026-01-01"
    assert math.isclose(gm[0].rate, len(matched) / 31.0, rel_tol=1e-12)


def test_auto_date_histogram(spark, built_index, fwd, matched):
    import datetime as dt

    tss = [fwd[d].ts for d in matched]
    lo, hi = min(tss), max(tss)

    def n_buckets(iv):
        if iv == "minute":
            return int(hi.timestamp()) // 60 - int(lo.timestamp()) // 60 + 1
        if iv == "hour":
            return int(hi.timestamp()) // 3600 - int(lo.timestamp()) // 3600 + 1
        return 1  # day+: fixture spans one day

    # small budget → coarse; the fixture spans a few hours in one day
    got = aggs.auto_date_histogram(spark, built_index, Q, target_buckets=3, cfg=TEST_CFG).collect()
    assert got[0].interval == ("hour" if n_buckets("hour") <= 3 else "day")
    # huge budget → finest rung that fits (minutes here)
    big = aggs.auto_date_histogram(
        spark, built_index, Q, target_buckets=100000, cfg=TEST_CFG
    ).collect()
    assert big[0].interval in ("second", "minute")
    want = Counter(
        fwd[d].ts.replace(second=0).strftime("%Y-%m-%d %H:%M:%S")
        if big[0].interval == "minute"
        else fwd[d].ts.strftime("%Y-%m-%d %H:%M:%S")
        for d in matched
    )
    assert {r.period: r.n_docs for r in big} == dict(want)
    assert sum(r.n_docs for r in got) == len(matched)
    with pytest.raises(ValueError):
        aggs.auto_date_histogram(spark, built_index, Q, target_buckets=0, cfg=TEST_CFG)


def test_scripted_metric(spark, built_index, fwd, matched):
    # map: chars per token; combine avg; finalize: scale to per-100-token
    want = [len(fwd[d].text) / len(tokenize_text(fwd[d].text)) for d in matched]
    r = aggs.scripted_metric_agg(
        spark, built_index, Q, "length(text) / dl", combine="avg",
        finalize_sql="value * 100", cfg=TEST_CFG,
    ).collect()[0]
    assert math.isclose(r.value, sum(want) / len(want) * 100, rel_tol=1e-9)
    rmax = aggs.scripted_metric_agg(
        spark, built_index, Q, "dl", combine="max", cfg=TEST_CFG
    ).collect()[0]
    assert rmax.value == max(len(tokenize_text(fwd[d].text)) for d in matched)
    with pytest.raises(ValueError):
        aggs.scripted_metric_agg(spark, built_index, Q, "dl", combine="fold", cfg=TEST_CFG)


def test_moving_percentiles(spark, built_index, fwd, matched):
    hist = _hour_hist(fwd, matched)
    periods = sorted(hist)
    vals = [hist[p] for p in periods]
    got = aggs.moving_percentiles_agg(
        spark, built_index, Q, interval="hour", window=3, pct=50.0, cfg=TEST_CFG
    ).collect()
    assert [r.period for r in got] == periods
    for i, r in enumerate(got):
        frame = np.array(vals[max(0, i - 2) : i + 1], dtype=np.float64)
        assert math.isclose(r.moving_pct, np.percentile(frame, 50), rel_tol=1e-9)


def test_significant_text_filters_duplicates(spark, built_index, fwd, matched):
    # without the filter: identical to significant_terms
    a = aggs.significant_text(
        spark, built_index, Q, size=5, filter_duplicate_text=False, cfg=TEST_CFG
    ).collect()
    b = aggs.significant_terms(spark, built_index, Q, size=5, cfg=TEST_CFG).collect()
    assert [(r.term, r.fg_df) for r in a] == [(r.term, r.fg_df) for r in b]
    # with the filter: fg counts follow the DEDUPED matched set
    from mysql_es_spark.functions.analyze import tokenize_text as tt

    seen, kept = set(), []
    for d in sorted(matched):
        fp = " ".join(tt(fwd[d].text))
        if fp not in seen:
            seen.add(fp)
            kept.append(d)
    n_fg = len(kept)
    fg = Counter()
    for d in kept:
        for t in set(tt(fwd[d].text)):
            fg[t] += 1
    got = aggs.significant_text(spark, built_index, Q, size=5, cfg=TEST_CFG).collect()
    for r in got:
        assert r.fg_df == fg[r.term], (r.term, r.fg_df, fg[r.term])


def test_significant_text_dedup_bites(spark, tmp_path_factory):
    """Copypasta can't fake significance: 3 identical matched docs carry
    a term once after the filter, twice-organic terms outrank it."""
    from datetime import datetime

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.plans.build import build_index

    cfg = IndexConfig(n_buckets=2, wave_size=1, salt_docs=64, term_buckets=4, block_size=8)
    docs = [
        ("a0", "alpha spam spam boiler"),
        ("a1", "alpha spam spam boiler"),   # exact dup of a0
        ("a2", "alpha spam spam boiler"),   # exact dup of a0
        ("a3", "alpha organic signal"),
        ("a4", "alpha organic signal two"),
        ("a5", "beta unrelated filler"),
        ("a6", "beta other noise"),
    ]
    d = str(tmp_path_factory.mktemp("sigtext") / "ix")
    df = spark.createDataFrame(
        [(c, 0, "user", t, None, datetime(2026, 1, 1)) for c, t in docs],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, cfg)
    raw = {r.term: r.fg_df for r in aggs.significant_terms(
        spark, d, "alpha", size=10, min_doc_count=1, cfg=cfg).collect()}
    ded = {r.term: r.fg_df for r in aggs.significant_text(
        spark, d, "alpha", size=10, min_doc_count=1, cfg=cfg).collect()}
    assert raw["spam"] == 3  # copypasta looks significant unfiltered
    # after dedup spam's fg% (1/3) drops below its bg% (3/7): gone entirely
    assert "spam" not in ded
    assert ded["organic"] == 2


def _py_category(text: str, max_tokens: int = 4) -> str:
    import re

    toks = [t for t in re.split(r"[^0-9a-z]+", text.lower())
            if t and not re.search(r"[0-9]", t)]
    return " ".join(toks[:max_tokens])


def test_categorize_text(spark, built_index, fwd, matched):
    want = Counter(c for c in (_py_category(fwd[d].text) for d in matched) if c)
    got = aggs.categorize_text(
        spark, built_index, Q, size=len(want) + 5, cfg=TEST_CFG
    ).collect()
    assert {r.category: r.doc_count for r in got} == dict(want)
    # engine order: doc_count desc, category asc
    keys = [(r.doc_count, r.category) for r in got]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))


def test_categorize_text_min_doc_count_and_size(spark, built_index, fwd, matched):
    want = Counter(c for c in (_py_category(fwd[d].text) for d in matched) if c)
    floor = 2
    kept = {c: n for c, n in want.items() if n >= floor}
    got = aggs.categorize_text(
        spark, built_index, Q, size=3, min_doc_count=floor, cfg=TEST_CFG
    ).collect()
    exp = sorted(kept.items(), key=lambda t: (-t[1], t[0]))[:3]
    assert [(r.category, r.doc_count) for r in got] == exp


def test_categorize_text_no_match(spark, built_index):
    assert aggs.categorize_text(spark, built_index, "zzzznope", cfg=TEST_CFG).count() == 0


def test_frequent_item_sets_df(spark):
    rows = [
        ("t1", "a"), ("t1", "b"), ("t1", "c"),
        ("t2", "a"), ("t2", "b"),
        ("t3", "a"), ("t3", "b"), ("t3", "b"),  # dup item in txn counts once
        ("t4", "c"), ("t4", None),
        ("t5", "a"),
    ]
    df = spark.createDataFrame(rows, schema="txn string, item string")
    got = [
        (r.itemset, r.set_size, r.doc_count, r.support)
        for r in aggs.frequent_item_sets_df(
            df, "txn", "item", min_support=0.4, size=10
        ).collect()
    ]
    # 5 transactions; a:4 b:3 c:2 ab:3 (others under 0.4 support)
    assert got == [
        ("a", 1, 4, 0.8),
        ("a b", 2, 3, 0.6),
        ("b", 1, 3, 0.6),
        ("c", 1, 2, 0.4),
    ]


def test_frequent_item_sets_index(spark, built_index, fwd, matched):
    from collections import Counter as C

    conv_of = {
        r.docid: (r.conv_id, r.tool)
        for r in spark.read.parquet(f"{built_index}/forward")
        .select("docid", "conv_id", "tool")
        .collect()
    }
    txns = {}
    for d in matched:
        conv, tool = conv_of[d]
        if tool is not None:
            txns.setdefault(conv, set()).add(tool)
    # count over ALL matched conversations (incl. all-null ones? no — a
    # txn enters only via a non-null item row, same as the operator)
    n = len(txns)
    singles = C()
    pairs = C()
    for items in txns.values():
        for it in items:
            singles[it] += 1
        ss = sorted(items)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pairs[f"{ss[i]} {ss[j]}"] += 1
    exp = [(k, 1, c) for k, c in singles.items() if c / n >= 0.05]
    exp += [(k, 2, c) for k, c in pairs.items() if c / n >= 0.05]
    exp.sort(key=lambda t: (-t[2], t[0]))
    got = [
        (r.itemset, r.set_size, r.doc_count)
        for r in aggs.frequent_item_sets(
            spark, built_index, Q, min_support=0.05, size=len(exp) + 5, cfg=TEST_CFG
        ).collect()
    ]
    assert got == exp[: len(got)] and got


def test_frequent_item_sets_validation(spark):
    df = spark.createDataFrame([("t", "a")], schema="txn string, item string")
    import pytest as _pt

    with _pt.raises(ValueError, match="max_set_size"):
        aggs.frequent_item_sets_df(df, "txn", "item", max_set_size=3)
    with _pt.raises(ValueError, match="min_support"):
        aggs.frequent_item_sets_df(df, "txn", "item", min_support=0.0)


def test_composite_mixed_sources(spark, built_index, matched):
    """ES composite with all three source types at once: date_histogram +
    terms + numeric histogram keys, full-bucket oracle + paging."""
    rows = (
        spark.read.parquet(f"{built_index}/forward")
        .select("docid", "role", "ts", "turn_idx")
        .collect()
    )
    info = {r.docid: r for r in rows}
    srcs = [
        {"day": {"date_histogram": {"field": "ts", "calendar_interval": "day"}}},
        "role",
        {"ti4": {"histogram": {"field": "turn_idx", "interval": 4}}},
    ]
    got = aggs.composite_agg(
        spark, built_index, Q, srcs, size=10**6, cfg=TEST_CFG
    ).collect()
    want = Counter()
    for d in matched:
        r = info[d]
        want[(r.ts.strftime("%Y-%m-%d"), r.role, float((r.turn_idx // 4) * 4))] += 1
    assert {(x.day, x.role, x.ti4): x.n_docs for x in got} == dict(want)
    keys = [(x.day, x.role, x.ti4) for x in got]
    assert keys == sorted(keys) and len(keys) > 6
    # paging across the mixed after-key
    first = aggs.composite_agg(spark, built_index, Q, srcs, size=3, cfg=TEST_CFG).collect()
    after = (first[-1].day, first[-1].role, first[-1].ti4)
    page2 = aggs.composite_agg(
        spark, built_index, Q, srcs, size=3, after=after, cfg=TEST_CFG
    ).collect()
    assert [(x.day, x.role, x.ti4) for x in page2] == keys[3:6]
