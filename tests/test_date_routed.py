"""Date-routed index layout (W3) — per-period sub-indexes, the Spark
analog of the reference's date-math index routing (River.java:275-296).
Covers: routing, per-period self-description, time-bounded pruning
(audited via inputFiles), ES query_then_fetch merge semantics, and
retention as a directory drop."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from conftest import TEST_CFG
from mysql_es_spark import corpus
from mysql_es_spark.operators.query import bm25_topk
from mysql_es_spark.plans.date_routed import (
    bm25_topk_routed,
    build_date_routed,
    drop_periods_before,
    list_periods,
    routing_meta,
    select_periods,
)

QUERY = "w0 w3"


@pytest.fixture(scope="module")
def routed_root(spark, tmp_path_factory):
    # spread conversations across 3 days deterministically by conv_id
    df = corpus.transcripts_df(spark, 900, seed=9).withColumn(
        "ts",
        F.expr("ts + make_interval(0, 0, 0, pmod(xxhash64(conv_id), 3), 0, 0, 0)"),
    )
    root = str(tmp_path_factory.mktemp("routed") / "root")
    res = build_date_routed(spark, df, root, TEST_CFG)
    assert res["periods_built"] == ["2026-01-01", "2026-01-02", "2026-01-03"]
    return root


def test_layout_and_meta(spark, routed_root):
    assert list_periods(routed_root) == ["2026-01-01", "2026-01-02", "2026-01-03"]
    meta = routing_meta(spark, routed_root)
    assert meta == {"ts_col": "ts", "fmt": "yyyy-MM-dd"}
    # every period is a full self-describing index
    for p in list_periods(routed_root):
        d = os.path.join(routed_root, f"period={p}")
        for t in ("forward", "postings", "term_dict", "corpus_stats", "index_meta"):
            assert os.path.isdir(os.path.join(d, t)), (p, t)


def test_single_period_equals_direct_query(spark, routed_root):
    p = "2026-01-02"
    routed = bm25_topk_routed(
        spark, routed_root, QUERY, k=5, start=p, end=p, cfg=TEST_CFG
    ).collect()
    direct = bm25_topk(
        spark, os.path.join(routed_root, f"period={p}"), QUERY, k=5, cfg=TEST_CFG
    ).collect()
    assert [(r.docid, round(r.score, 9)) for r in routed] == [
        (r.docid, round(r.score, 9)) for r in direct
    ]
    assert all(r.period == p for r in routed)


def test_multi_period_merge_is_query_then_fetch(spark, routed_root):
    """Cross-period top-k = merge of per-period top-k, each scored with
    its OWN sub-index stats (the ES default)."""
    got = [
        (r.period, r.docid, round(r.score, 9))
        for r in bm25_topk_routed(spark, routed_root, QUERY, k=7, cfg=TEST_CFG).collect()
    ]
    brute = []
    for p in list_periods(routed_root):
        for r in bm25_topk(
            spark, os.path.join(routed_root, f"period={p}"), QUERY, k=7, cfg=TEST_CFG
        ).collect():
            brute.append((p, r.docid, round(r.score, 9)))
    brute.sort(key=lambda t: (-t[2], t[1]))
    assert got == brute[:7]


def test_time_bound_prunes_period_dirs(spark, routed_root, monkeypatch):
    """The pruning audit: a bounded query must touch the in-range period
    sub-indexes ONLY — no plan, scan, or stats read against out-of-range
    directories ever exists."""
    import mysql_es_spark.operators.query as q

    touched = []
    real = q.bm25_topk

    def spy(spark_, index_dir, *a, **kw):
        touched.append(index_dir)
        return real(spark_, index_dir, *a, **kw)

    monkeypatch.setattr(q, "bm25_topk", spy)
    out = bm25_topk_routed(
        spark, routed_root, QUERY, k=5, start="2026-01-03", cfg=TEST_CFG
    ).collect()
    assert out
    assert touched and all("period=2026-01-03" in d for d in touched), touched


def test_select_periods_bounds():
    # pure function, lexicographic on zero-padded dates
    import mysql_es_spark.plans.date_routed as dr

    orig = dr.list_periods
    dr.list_periods = lambda root: ["2026-01-01", "2026-01-02", "2026-01-03"]
    try:
        assert dr.select_periods("x", "2026-01-02", None) == ["2026-01-02", "2026-01-03"]
        assert dr.select_periods("x", None, "2026-01-01") == ["2026-01-01"]
        assert dr.select_periods("x", "2026-01-04", None) == []
    finally:
        dr.list_periods = orig


def test_retention_drop(spark, routed_root):
    """Runs last (mutates the shared fixture): dropping old periods is a
    directory delete and surviving queries are untouched."""
    before = bm25_topk_routed(
        spark, routed_root, QUERY, k=5, start="2026-01-02", cfg=TEST_CFG
    ).collect()
    dropped = drop_periods_before(routed_root, "2026-01-02")
    assert dropped == ["2026-01-01"]
    assert list_periods(routed_root) == ["2026-01-02", "2026-01-03"]
    after = bm25_topk_routed(spark, routed_root, QUERY, k=5, cfg=TEST_CFG).collect()
    assert [(r.docid, round(r.score, 9)) for r in after] == [
        (r.docid, round(r.score, 9)) for r in before
    ]


def test_dfs_mode_rank_identical_to_monolithic(spark, routed_root):
    """dfs_query_then_fetch over periods == one index over the same docs:
    global df/avgdl make scores identical to the NumPy oracle on the
    union corpus, unlike the per-period default."""
    import math

    from mysql_es_spark.oracle import build_oracle_index, score_query
    from mysql_es_spark.plans.date_routed import (
        _period_dir,
        bm25_topk_routed_dfs,
    )

    keyed = {}
    for p in list_periods(routed_root):
        for r in (
            spark.read.parquet(f"{_period_dir(routed_root, p)}/forward")
            .select("docid", "text")
            .collect()
        ):
            keyed[(p, r.docid)] = r.text
    uid_of = {pd_: i for i, pd_ in enumerate(sorted(keyed))}
    inv = {i: pd_ for pd_, i in uid_of.items()}
    oix = build_oracle_index([(uid_of[pd_], t) for pd_, t in keyed.items()])
    want_raw = score_query(oix, QUERY, k=len(keyed))
    got = bm25_topk_routed_dfs(spark, routed_root, QUERY, k=12, cfg=TEST_CFG).collect()
    for r, (_, ws) in zip(got, want_raw[:12]):
        assert math.isclose(r.score, ws, abs_tol=1e-9)
    # the doc sets agree (uid tiebreak order may differ within equal scores)
    assert {(r.period, r.docid) for r in got} == {inv[d] for d, _ in want_raw[:12]}


def test_dfs_respects_date_bounds(spark, routed_root):
    from mysql_es_spark.plans.date_routed import bm25_topk_routed_dfs

    got = bm25_topk_routed_dfs(
        spark, routed_root, QUERY, k=50, start="2026-01-02", end="2026-01-02", cfg=TEST_CFG
    ).collect()
    assert got and {r.period for r in got} == {"2026-01-02"}
    assert bm25_topk_routed_dfs(
        spark, routed_root, "zzznope", k=5, cfg=TEST_CFG
    ).count() == 0
