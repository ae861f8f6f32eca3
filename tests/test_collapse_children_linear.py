"""collapse inner_hits, children agg (multi-turn fan-out), normalized
linear fusion — Python oracles on the shared transcripts index."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators import aggs
from mysql_es_spark.operators.fusion import linear_fuse
from mysql_es_spark.operators.query import bm25_collapse_topk, query_terms
from tests.conftest import TEST_CFG

Q = "w0 w3"


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = (
        spark.read.parquet(f"{built_index}/forward")
        .select("docid", "conv_id", "role", "text")
        .collect()
    )
    return {r.docid: r for r in rows}


@pytest.fixture(scope="module")
def dls(fwd):
    return {d: len(tokenize_text(r.text)) for d, r in fwd.items()}


def test_collapse_inner_hits(spark, built_index, fwd):
    out = bm25_collapse_topk(
        spark, built_index, Q, "role", k=2, cfg=TEST_CFG, order_round=4,
        inner_hits=3,
    ).collect()
    winners = bm25_collapse_topk(
        spark, built_index, Q, "role", k=2, cfg=TEST_CFG, order_round=4
    ).collect()
    top_groups = {r.role for r in winners}
    # exactly the winners' groups, each with <=3 hits, ranks 1..n
    by_g = defaultdict(list)
    for r in sorted(out, key=lambda r: (r.role, r.hit_rank)):
        by_g[r.role].append(r)
    assert set(by_g) == top_groups
    for g, rows in by_g.items():
        assert [r.hit_rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        # hits are ordered by (rounded score desc, docid asc) within group
        keys = [(-round(r.score, 4), r.docid) for r in rows]
        assert keys == sorted(keys)
        # rank-1 hit is the group winner
        w = next(x for x in winners if x.role == g)
        assert rows[0].docid == w.docid


def test_children_agg_multiturn_fanout(spark, built_index, fwd, dls):
    qt = set(query_terms(Q))
    matched = {d for d, r in fwd.items() if qt & set(tokenize_text(r.text))}
    parents = {(fwd[d].role, fwd[d].conv_id) for d in matched}
    conv_docs = defaultdict(list)
    for d, r in fwd.items():
        conv_docs[r.conv_id].append(d)
    want = {}
    for role in {b for b, _ in parents}:
        convs = {c for b, c in parents if b == role}
        kids = [d for c in convs for d in conv_docs[c]]
        want[role] = (
            len(convs),
            len(kids),
            float(np.mean([dls[d] for d in kids])),
        )
    got = aggs.children_agg(spark, built_index, Q, "role", cfg=TEST_CFG).collect()
    assert {r.role for r in got} == set(want)
    for r in got:
        np_, nc, avg = want[r.role]
        assert (r.n_parents, r.n_children) == (np_, nc)
        assert abs(r.avg_child_dl - avg) < 1e-9
    # the fan-out is real: children outnumber the matched docs per bucket
    assert any(r.n_children > r.n_parents for r in got)


def test_parent_agg_dedups_parents(spark, built_index, fwd, dls):
    qt = set(query_terms(Q))
    matched = {d for d, r in fwd.items() if qt & set(tokenize_text(r.text))}
    parents = {(fwd[d].role, fwd[d].conv_id) for d in matched}
    conv_docs = defaultdict(list)
    for d, r in fwd.items():
        conv_docs[r.conv_id].append(d)
    want = {}
    for role in {b for b, _ in parents}:
        convs = sorted({c for b, c in parents if b == role})
        turns = [len(conv_docs[c]) for c in convs]
        conv_dl = [sum(dls[d] for d in conv_docs[c]) for c in convs]
        want[role] = (
            len(convs),
            float(np.mean(turns)),
            float(np.mean(conv_dl)),
        )
    got = aggs.parent_agg(spark, built_index, Q, "role", cfg=TEST_CFG).collect()
    assert {r.role for r in got} == set(want)
    for r in got:
        np_, avt, avd = want[r.role]
        assert r.n_parents == np_
        assert abs(r.avg_parent_turns - avt) < 1e-9
        assert abs(r.avg_parent_dl - avd) < 1e-9
    # parents really deduped: matched turns outnumber parents in some bucket
    by_role = Counter(fwd[d].role for d in matched)
    assert any(by_role[r.role] > r.n_parents for r in got)


def test_linear_fuse_minmax(spark):
    a = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 0.0)], "doc_id long, s double"
    )
    b = spark.createDataFrame(
        [(2, 0.4), (3, 0.2), (4, 0.0)], "doc_id long, s double"
    )
    out = {
        r.doc_id: (round(r.score, 9), r.n_retrievers)
        for r in linear_fuse([(a, 0.5), (b, 2.0)], k=10, normalize="minmax").collect()
    }
    # a-normalized: 1 -> 1.0, 2 -> 0.5, 3 -> 0.0 ; b: 2 -> 1.0, 3 -> 0.5, 4 -> 0.0
    assert out == {
        1: (0.5, 1),
        2: (round(0.5 * 0.5 + 2.0 * 1.0, 9), 2),
        3: (round(0.0 + 2.0 * 0.5, 9), 2),
        4: (0.0, 1),
    }


def test_linear_fuse_l2_and_constant_window(spark):
    a = spark.createDataFrame([(1, 3.0), (2, 4.0)], "doc_id long, s double")
    out = {r.doc_id: round(r.score, 9) for r in linear_fuse([(a, 1.0)], normalize="l2").collect()}
    assert out == {1: 0.6, 2: 0.8}
    # constant window: minmax maps everything to 0 (ES identical-scores case)
    c = spark.createDataFrame([(1, 7.0), (2, 7.0)], "doc_id long, s double")
    outc = {r.doc_id: r.score for r in linear_fuse([(c, 1.0)], normalize="minmax").collect()}
    assert outc == {1: 0.0, 2: 0.0}
    with pytest.raises(ValueError):
        linear_fuse([(a, 1.0)], normalize="softmax")


def test_parent_id_multiturn(spark, built_index, fwd):
    from mysql_es_spark.operators.query import parent_id_topk

    convs = Counter(r.conv_id for r in fwd.values())
    conv, n = next((c, n) for c, n in convs.most_common() if n >= 2)
    out = parent_id_topk(spark, built_index, conv, k=1000, boost=2.5).collect()
    want = sorted(d for d, r in fwd.items() if r.conv_id == conv)
    assert [r.docid for r in out] == want
    assert len(out) == n and all(r.score == 2.5 for r in out)
    # unknown parent: empty, no error
    assert parent_id_topk(spark, built_index, "no-such-conv").count() == 0


def test_export_slices_partition(spark, built_index, fwd):
    from mysql_es_spark.operators.query import match_export

    full = {r.docid for r in match_export(spark, built_index, Q, cfg=TEST_CFG).collect()}
    parts = [
        {r.docid for r in match_export(
            spark, built_index, Q, cfg=TEST_CFG, slice_id=i, slice_max=3
        ).collect()}
        for i in range(3)
    ]
    # disjoint and collectively exhaustive
    assert set().union(*parts) == full
    assert sum(len(p) for p in parts) == len(full)
    import pytest as _pt
    with _pt.raises(ValueError):
        match_export(spark, built_index, Q, cfg=TEST_CFG, slice_id=3, slice_max=3)
    with _pt.raises(ValueError):
        match_export(spark, built_index, Q, cfg=TEST_CFG, slice_id=1)
