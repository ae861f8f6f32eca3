"""search_after pagination: cursor pages must tile the global ranking
exactly, on the simple, pruned, and distributed paths."""

from __future__ import annotations

import pytest

from mysql_es_spark.operators.query import bm25_topk
from tests.conftest import TEST_CFG

Q = "w0 w3 café"
K = 7


def _page(spark, ix, after, mode, cfg=TEST_CFG):
    return [
        (r.docid, r.score)
        for r in bm25_topk(spark, ix, Q, k=K, cfg=cfg, mode=mode, after=after).collect()
    ]


@pytest.mark.parametrize("mode", ["simple", "pruned"])
def test_pages_tile_ranking(spark, built_index, mode):
    full = [
        (r.docid, r.score)
        for r in bm25_topk(spark, built_index, Q, k=3 * K, cfg=TEST_CFG, mode="simple").collect()
    ]
    assert len(full) == 3 * K
    pages, after = [], None
    for _ in range(3):
        page = _page(spark, built_index, after, mode)
        pages.extend(page)
        after = (page[-1][1], page[-1][0])  # cursor is (score, docid)
    assert [d for d, _ in pages] == [d for d, _ in full]
    for (_, ps), (_, fs) in zip(pages, full):
        assert abs(ps - fs) < 1e-9


def test_distributed_path_pagination(spark, built_index):
    cfg = TEST_CFG.with_(max_driver_salts=0)
    full = [
        (r.docid, r.score)
        for r in bm25_topk(spark, built_index, Q, k=2 * K, cfg=TEST_CFG, mode="simple").collect()
    ]
    page1 = _page(spark, built_index, None, "pruned", cfg)
    page2 = _page(spark, built_index, (page1[-1][1], page1[-1][0]), "pruned", cfg)
    assert [d for d, _ in page1 + page2] == [d for d, _ in full]


def test_cursor_past_end_is_empty(spark, built_index):
    assert bm25_topk(
        spark, built_index, Q, k=K, cfg=TEST_CFG, mode="pruned", after=(-1.0, 10**12)
    ).count() == 0
