"""constant_score / distance_feature / pinned / match_bool_prefix /
span_first: each vs an independent Python oracle over the forward table."""

from __future__ import annotations

from collections import Counter
from datetime import datetime

import numpy as np
import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import (
    bm25_topk,
    constant_score_topk,
    distance_feature,
    distance_feature_topk,
    match_bool_prefix_topk,
    pinned_topk,
    span_first_topk,
)
from mysql_es_spark.plans.build import build_index
from tests.conftest import TEST_CFG


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    return {r.docid: r.text for r in rows}


def _bm25_scores(fwd, terms):
    """Per-doc disjunctive BM25 over the given terms (full corpus stats)."""
    toks = {d: tokenize_text(t) for d, t in fwd.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = Counter(t for ts in toks.values() for t in set(ts))
    out = {}
    for d, ts in toks.items():
        tf = Counter(ts)
        s = 0.0
        for t in set(terms):
            if t not in tf or df[t] == 0:
                continue
            idf = float(np.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)))
            s += idf * tf[t] / (tf[t] + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
        if s > 0.0:
            out[d] = s
    return out


# ---------------------------------------------------------------------------
# constant_score
# ---------------------------------------------------------------------------


def test_constant_score_matches_filter_set(spark, built_index, fwd):
    terms = ["w0", "w3"]
    want = sorted(d for d, t in fwd.items() if set(terms) & set(tokenize_text(t)))
    got = constant_score_topk(
        spark, built_index, "w0 w3", k=len(fwd) + 1, boost=1.5, cfg=TEST_CFG
    ).collect()
    assert [r.docid for r in got] == want
    assert all(r.score == 1.5 for r in got)


def test_constant_score_k_and_empty(spark, built_index):
    assert constant_score_topk(spark, built_index, "", cfg=TEST_CFG).count() == 0
    assert (
        constant_score_topk(spark, built_index, "zzznope", cfg=TEST_CFG).count() == 0
    )
    got = constant_score_topk(spark, built_index, "w0", k=5, cfg=TEST_CFG).collect()
    assert len(got) == 5
    assert [r.docid for r in got] == sorted(r.docid for r in got)


# ---------------------------------------------------------------------------
# pinned
# ---------------------------------------------------------------------------


def test_pinned_promotes_in_order(spark, built_index, fwd):
    keys = spark.read.parquet(f"{built_index}/forward").select("docid", "doc_key").collect()
    key_of = {r.docid: r.doc_key for r in keys}
    organic = bm25_topk(spark, built_index, "w0 w3", k=12, cfg=TEST_CFG).collect()
    # pin: one doc from mid-organic (dedup case) + one non-matching doc
    pin_docid = organic[5].docid
    nonmatch = sorted(set(fwd) - {r.docid for r in organic})[0]
    pins = [key_of[nonmatch], key_of[pin_docid], "missing:999"]
    got = pinned_topk(spark, built_index, "w0 w3", pins, k=10, cfg=TEST_CFG).collect()
    # pinned first, list order, scores pinned_base - i over present keys
    assert got[0].docid == nonmatch and got[0].score == 1.0e6
    assert got[1].docid == pin_docid and got[1].score == 1.0e6 - 1
    # organic follows with the pinned doc removed, ranks preserved
    rest = [r.docid for r in organic if r.docid != pin_docid][:8]
    assert [r.docid for r in got[2:]] == rest


def test_pinned_no_pins_equals_bm25(spark, built_index):
    a = pinned_topk(spark, built_index, "w0 w3", [], k=8, cfg=TEST_CFG).collect()
    b = bm25_topk(spark, built_index, "w0 w3", k=8, cfg=TEST_CFG).collect()
    assert [(r.docid, round(r.score, 9)) for r in a] == [
        (r.docid, round(r.score, 9)) for r in b
    ]


# ---------------------------------------------------------------------------
# match_bool_prefix
# ---------------------------------------------------------------------------


def _mbp_oracle(fwd, query, max_expansions=50):
    seq = tokenize_text(query)
    full, prefix = list(dict.fromkeys(seq[:-1])), seq[-1]
    toks = {d: tokenize_text(t) for d, t in fwd.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = Counter(t for ts in toks.values() for t in set(ts))
    exp = sorted(
        (t for t in df if t.startswith(prefix)), key=lambda t: (-df[t], t)
    )[:max_expansions]
    out = {}
    for d, ts in toks.items():
        tf = Counter(ts)
        s = 0.0
        for t in full:
            if t in tf:
                idf = float(np.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)))
                s += idf * tf[t] / (tf[t] + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
        best = 0.0
        for t in exp:
            if t in tf:
                idf = float(np.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)))
                best = max(
                    best, idf * tf[t] / (tf[t] + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
                )
        if s + best > 0.0:
            out[d] = s + best
    return sorted(out.items(), key=lambda x: (-x[1], x[0]))


@pytest.mark.parametrize("q", ["w0 w3 w1", "w9"])
def test_match_bool_prefix_matches_oracle(spark, built_index, fwd, q):
    want = _mbp_oracle(fwd, q)[:15]
    got = match_bool_prefix_topk(spark, built_index, q, k=15, cfg=TEST_CFG).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, rel=1e-9)


def test_match_bool_prefix_should_semantics(spark, built_index, fwd):
    """A doc matching only the prefix clause (not the full terms) is
    admitted — bool-should, unlike match_phrase_prefix."""
    want = {d for d, _ in _mbp_oracle(fwd, "w0 w3 w1")}
    full_only = {
        d for d, s in _bm25_scores(fwd, ["w0", "w3"]).items() if s > 0.0
    }
    assert want - full_only, "fixture must contain prefix-only matches"
    got = match_bool_prefix_topk(
        spark, built_index, "w0 w3 w1", k=len(fwd), cfg=TEST_CFG
    ).collect()
    assert {r.docid for r in got} == want


# ---------------------------------------------------------------------------
# distance_feature + span_first over a tiny dated positional corpus
# ---------------------------------------------------------------------------

DF_CFG = IndexConfig(
    n_buckets=2, wave_size=2, salt_docs=64, term_buckets=4, block_size=4,
    with_positions=True,
)

DOCS = [
    ("c0", "alpha beta gamma", datetime(2026, 1, 1)),
    ("c1", "beta alpha", datetime(2026, 1, 4)),
    ("c2", "gamma gamma alpha beta", datetime(2026, 1, 10)),
    ("c3", "delta beta beta", datetime(2026, 2, 1)),
    ("c4", "alpha alpha alpha", datetime(2026, 1, 2)),
    ("c5", "x y z alpha", datetime(2026, 1, 6)),
]


@pytest.fixture(scope="module")
def dated_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dated") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, ts) for cid, text, ts in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, DF_CFG)
    return d


def test_distance_feature_matches_oracle(spark, dated_index):
    fwd_rows = spark.read.parquet(f"{dated_index}/forward").select(
        "docid", "text", "ts"
    ).collect()
    fwd = {r.docid: r.text for r in fwd_rows}
    days = {r.docid: abs((r.ts.date() - datetime(2026, 1, 4).date()).days) for r in fwd_rows}
    base = _bm25_scores(fwd, ["alpha", "beta"])
    pivot, boost = 3.0, 2.0
    want = sorted(
        ((d, s + boost * pivot / (pivot + days[d])) for d, s in base.items()),
        key=lambda x: (-x[1], x[0]),
    )
    got = distance_feature_topk(
        spark, dated_index, "alpha beta", "2026-01-04", pivot, k=10, boost=boost,
        cfg=DF_CFG,
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, rel=1e-9)


def test_distance_feature_prunes_salt_ranges(spark, tmp_path):
    """Round-4 WAND restoration (VERDICT r3 item 2): with the feature's
    max (= boost) added to the per-salt upper bound, a head-term recency
    query must decode strictly fewer salt ranges than the full match set
    — and stay rank+score identical to the unpruned decode.

    Corpus placement is deterministic: n_buckets=1 makes docid = rank of
    conv_id, so salt = rank // salt_docs. Docs in salts 0–3 carry the
    selective term 'rare'; every doc carries the head term 'hot'. After
    phase 1 establishes tau from rare-bearing salts, the hot-only salts'
    bound (idf_hot·tfb + boost) is far below tau and they are pruned."""
    from datetime import datetime as dt, timedelta
    from mysql_es_spark.operators.query import function_score_topk

    cfg = IndexConfig(
        n_buckets=1, wave_size=1, salt_docs=64, term_buckets=4, block_size=16
    )
    n, rare_n = 2048, 256
    rows = []
    for i in range(n):
        text = ("hot rare p1 p2" if i < rare_n else "hot fill p1 p2")
        rows.append(
            (f"c{i:05d}", 0, "user", text, None, dt(2026, 1, 1) + timedelta(days=i % 50))
        )
    df = spark.createDataFrame(
        rows,
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    ix = str(tmp_path / "ix")
    build_index(spark, df, ix, cfg)

    boost, pivot, origin = 0.01, 5.0, "2026-01-10"
    prof: dict = {}
    pruned = distance_feature_topk(
        spark, ix, "hot rare", origin, pivot, k=10, boost=boost, cfg=cfg,
        profile=prof,
    ).collect()
    full = function_score_topk(
        spark, ix, "hot rare",
        distance_feature("ts", origin, pivot, boost),
        k=10, boost_mode="sum", cfg=cfg, additive_max=None,
    ).collect()
    assert [(r.docid, r.score) for r in pruned] == [(r.docid, r.score) for r in full]
    assert prof["path"] == "additive-pruned-driver"
    last = prof["phases"][-1]
    assert last["pruned_salts"] > 0, prof
    assert last["salts_decoded"] < prof["n_salts"], prof
    # the head term spans all 32 salts; only the rare-bearing ones decode
    assert prof["n_salts"] == n // 64
    assert last["salts_decoded"] <= rare_n // 64


def test_distance_feature_distributed_path_identical(spark, tmp_path):
    """max_driver_salts=0 forces the distributed additive selection (the
    10^12-doc shape) — results must equal both the driver-ranked pruned
    path and the full decode."""
    from datetime import datetime as dt, timedelta
    from mysql_es_spark.operators.query import function_score_topk

    cfg = IndexConfig(
        n_buckets=1, wave_size=1, salt_docs=64, term_buckets=4, block_size=16
    )
    rows = [
        (f"c{i:05d}", 0, "user",
         ("hot rare p1 p2" if i < 128 else "hot fill p1 p2"),
         None, dt(2026, 1, 1) + timedelta(days=i % 50))
        for i in range(1024)
    ]
    df = spark.createDataFrame(
        rows,
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    ix = str(tmp_path / "ix")
    build_index(spark, df, ix, cfg)
    args = ("hot rare", "2026-01-10", 5.0)
    full = function_score_topk(
        spark, ix, args[0], distance_feature("ts", args[1], args[2], 0.5),
        k=10, boost_mode="sum", cfg=cfg, additive_max=None,
    ).collect()
    prof = {}
    driver = distance_feature_topk(
        spark, ix, *args, k=10, boost=0.5, cfg=cfg, profile=prof
    ).collect()
    assert prof["path"] == "additive-pruned-driver"
    prof2 = {}
    dist = distance_feature_topk(
        spark, ix, *args, k=10, boost=0.5,
        cfg=cfg.with_(max_driver_salts=0), profile=prof2,
    ).collect()
    assert prof2["path"] == "additive-pruned-distributed"
    want = [(r.docid, r.score) for r in full]
    assert [(r.docid, r.score) for r in driver] == want
    assert [(r.docid, r.score) for r in dist] == want


def test_distance_feature_pruned_equals_full_with_large_boost(spark, dated_index):
    """When the feature dominates (large boost), pruning may keep every
    salt — results must still be identical to the full decode."""
    from mysql_es_spark.operators.query import function_score_topk

    full = function_score_topk(
        spark, dated_index, "alpha beta",
        distance_feature("ts", "2026-01-04", 3.0, 5.0),
        k=10, boost_mode="sum", cfg=DF_CFG, additive_max=None,
    ).collect()
    pruned = distance_feature_topk(
        spark, dated_index, "alpha beta", "2026-01-04", 3.0, k=10, boost=5.0,
        cfg=DF_CFG,
    ).collect()
    assert [(r.docid, r.score) for r in pruned] == [(r.docid, r.score) for r in full]


def test_span_first_matches_oracle(spark, dated_index):
    fwd_rows = spark.read.parquet(f"{dated_index}/forward").select(
        "docid", "text"
    ).collect()
    fwd = {r.docid: r.text for r in fwd_rows}
    for term, end in [("alpha", 1), ("alpha", 2), ("beta", 2), ("gamma", 3)]:
        toks = {d: tokenize_text(t) for d, t in fwd.items()}
        match = {
            d for d, ts in toks.items() if term in ts and ts.index(term) < end
        }
        base = _bm25_scores(fwd, [term])
        want = sorted(
            ((d, base[d]) for d in match), key=lambda x: (-x[1], x[0])
        )
        got = span_first_topk(
            spark, dated_index, term, end=end, k=10, cfg=DF_CFG
        ).collect()
        assert [r.docid for r in got] == [d for d, _ in want], (term, end)
        for r, (_, s) in zip(got, want):
            assert r.score == pytest.approx(s, rel=1e-9)


def test_span_first_requires_positions(spark, built_index):
    with pytest.raises(ValueError, match="positions"):
        span_first_topk(spark, built_index, "w0", end=2, cfg=TEST_CFG).collect()


def test_span_first_single_term_only(spark, dated_index):
    with pytest.raises(ValueError, match="single"):
        span_first_topk(spark, dated_index, "alpha beta", end=2, cfg=DF_CFG)


def _span_not_oracle(fwd, inc, exc, pre, post):
    toks = {d: tokenize_text(t) for d, t in fwd.items()}
    base = _bm25_scores(fwd, [inc])
    out = {}
    for d, ts in toks.items():
        ps = [i for i, t in enumerate(ts) if t == inc]
        qs = [i for i, t in enumerate(ts) if t == exc]
        hits = sum(1 for p in ps if not any(p - pre <= q <= p + post for q in qs))
        if hits:
            out[d] = (base[d], hits)
    return sorted(out.items(), key=lambda x: (-x[1][0], x[0]))


@pytest.mark.parametrize("pre,post", [(0, 0), (1, 0), (0, 1), (2, 2)])
def test_span_not_matches_oracle(spark, dated_index, pre, post):
    fwd_rows = spark.read.parquet(f"{dated_index}/forward").select(
        "docid", "text"
    ).collect()
    fwd = {r.docid: r.text for r in fwd_rows}
    from mysql_es_spark.operators.query import span_not_topk

    want = _span_not_oracle(fwd, "alpha", "beta", pre, post)
    got = span_not_topk(
        spark, dated_index, "alpha", "beta", pre=pre, post=post, k=10, cfg=DF_CFG
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want], (pre, post)
    for r, (_, (s, h)) in zip(got, want):
        assert r.score == pytest.approx(s, rel=1e-9)
        assert r.n_hits == h


def test_span_not_absent_exclude(spark, dated_index):
    from mysql_es_spark.operators.query import span_not_topk

    fwd_rows = spark.read.parquet(f"{dated_index}/forward").select(
        "docid", "text"
    ).collect()
    fwd = {r.docid: r.text for r in fwd_rows}
    base = _bm25_scores(fwd, ["alpha"])
    got = span_not_topk(
        spark, dated_index, "alpha", "zzznope", pre=3, post=3, k=10, cfg=DF_CFG
    ).collect()
    want = sorted(base.items(), key=lambda x: (-x[1], x[0]))
    assert [r.docid for r in got] == [d for d, _ in want]


def test_span_not_validation(spark, dated_index, built_index):
    from mysql_es_spark.operators.query import span_not_topk

    with pytest.raises(ValueError, match="single"):
        span_not_topk(spark, dated_index, "alpha beta", "gamma", cfg=DF_CFG)
    with pytest.raises(ValueError, match="differ"):
        span_not_topk(spark, dated_index, "alpha", "alpha", cfg=DF_CFG)
    with pytest.raises(ValueError, match="positions"):
        span_not_topk(spark, built_index, "w0", "w1", cfg=TEST_CFG).collect()


# ---------------------------------------------------------------------------
# min_score + exists
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["simple", "pruned"])
def test_min_score_floor(spark, built_index, fwd, mode):
    base = _bm25_scores(fwd, ["w0", "w3"])
    ranked = sorted(base.items(), key=lambda x: (-x[1], x[0]))
    floor = ranked[6][1] - 1e-12  # floor right below the 7th score
    want = [(d, s) for d, s in ranked if s >= floor][:20]
    got = bm25_topk(
        spark, built_index, "w0 w3", k=20, cfg=TEST_CFG, mode=mode,
        min_score=floor,
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    assert all(r.score >= floor for r in got)
    # a floor above the max score yields nothing
    assert (
        bm25_topk(
            spark, built_index, "w0 w3", k=5, cfg=TEST_CFG, mode=mode,
            min_score=ranked[0][1] + 1.0,
        ).count()
        == 0
    )


def test_min_score_distributed_path(spark, built_index, fwd):
    base = _bm25_scores(fwd, ["w0", "w3"])
    ranked = sorted(base.items(), key=lambda x: (-x[1], x[0]))
    floor = ranked[4][1] - 1e-12
    cfg0 = TEST_CFG.with_(max_driver_salts=0)  # force the distributed path
    got = bm25_topk(
        spark, built_index, "w0 w3", k=10, cfg=cfg0, mode="pruned",
        min_score=floor,
    ).collect()
    want = [(d, s) for d, s in ranked if s >= floor][:10]
    assert [r.docid for r in got] == [d for d, _ in want]


def test_exists_query(spark, built_index):
    rows = spark.read.parquet(f"{built_index}/forward").select("docid", "tool").collect()
    want = sorted(r.docid for r in rows if r.tool is not None)
    assert 0 < len(want) < len(rows), "fixture must mix null and set tools"
    from mysql_es_spark.operators.query import exists_topk

    got = exists_topk(spark, built_index, "tool", k=len(rows), boost=1.0, cfg=TEST_CFG).collect()
    assert [r.docid for r in got] == want
    assert all(r.score == 1.0 for r in got)


def test_match_export_full_set(spark, built_index, fwd, tmp_path):
    from mysql_es_spark.operators.query import match_export

    base = _bm25_scores(fwd, ["w0", "w3"])
    got = match_export(spark, built_index, "w0 w3", cfg=TEST_CFG).collect()
    assert {r.docid: round(r.score, 9) for r in got} == {
        d: round(s, 9) for d, s in base.items()
    }
    # written form round-trips identically
    out = str(tmp_path / "export")
    got2 = match_export(spark, built_index, "w0 w3", out_dir=out, cfg=TEST_CFG)
    assert got2.count() == len(base)
    assert spark.read.parquet(out).count() == len(base)
    assert match_export(spark, built_index, "zzznope", cfg=TEST_CFG).count() == 0


# ---------------------------------------------------------------------------
# phrase over a synonym graph (span_or inside span_near)
# ---------------------------------------------------------------------------


def _syn_phrase_oracle(fwd, slots):
    toks = {d: tokenize_text(t) for d, t in fwd.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = Counter(t for ts in toks.values() for t in set(ts))
    out = {}
    for d, ts in toks.items():
        hits = 0
        for i in range(len(ts) - len(slots) + 1):
            if all(ts[i + j] in slots[j] for j in range(len(slots))):
                hits += 1
        if not hits:
            continue
        tf = Counter(ts)
        s = 0.0
        for sl in slots:
            best = 0.0
            for t in sl:
                if t in tf and df[t]:
                    idf = float(np.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)))
                    best = max(
                        best,
                        idf * tf[t] / (tf[t] + 1.2 * (0.25 + 0.75 * len(ts) / avgdl)),
                    )
            s += best
        out[d] = (s, hits)
    return sorted(out.items(), key=lambda x: (-x[1][0], x[0]))


@pytest.fixture(scope="module")
def syn_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("syn") / "ix")
    docs = [
        ("s0", "fast table scan today"),
        ("s1", "fast index scan now"),
        ("s2", "fast scan"),          # 'scan' right after 'fast' (1-slot gap)
        ("s3", "slow table scan"),
        ("s4", "fast table query fast index query"),
        ("s5", "table fast scan"),
        ("s6", "fast table fast index scan"),
    ]
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in docs],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, DF_CFG)
    return d


def test_phrase_synonym_matches_oracle(spark, syn_index):
    from mysql_es_spark.operators.query import phrase_synonym_topk

    fwd_rows = spark.read.parquet(f"{syn_index}/forward").select("docid", "text").collect()
    fwd = {r.docid: r.text for r in fwd_rows}
    for slots in (
        ["fast", ["table", "index"], ["scan", "query"]],
        [["fast", "slow"], "table"],
        ["fast", ["scan"]],
    ):
        norm = [[s] if isinstance(s, str) else s for s in slots]
        want = _syn_phrase_oracle(fwd, norm)
        got = phrase_synonym_topk(spark, syn_index, slots, k=10, cfg=DF_CFG).collect()
        assert [r.docid for r in got] == [d for d, _ in want], slots
        for r, (_, (s, h)) in zip(got, want):
            assert r.score == pytest.approx(s, rel=1e-9) and r.n_hits == h


def test_phrase_synonym_validation(spark, syn_index):
    from mysql_es_spark.operators.query import phrase_synonym_topk

    with pytest.raises(ValueError, match="one token"):
        phrase_synonym_topk(spark, syn_index, [["fast table"]], cfg=DF_CFG)
    with pytest.raises(ValueError, match="one slot"):
        phrase_synonym_topk(spark, syn_index, ["fast", ["fast", "slow"]], cfg=DF_CFG)
    # a slot with only unknown terms can never match
    assert (
        phrase_synonym_topk(
            spark, syn_index, ["fast", ["zzznope"]], k=5, cfg=DF_CFG
        ).count()
        == 0
    )
