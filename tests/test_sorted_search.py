"""Sort-by-field search (ES `sort` + search_after on arbitrary fields):
pages must tile the global field order exactly, independently verified
against a Python sort of the matching forward rows."""

from __future__ import annotations

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import field_caps, sorted_search
from tests.conftest import TEST_CFG

Q = "w0 w3"
SORT = [("role", "asc"), ("ts", "desc")]


def _expected(tiny_transcripts, spark, built_index):
    """Independent oracle: match set from raw tokenization, ordered by
    (role asc, ts desc, docid asc)."""
    from mysql_es_spark.sources import tables as tbl

    terms = set(tokenize_text(Q))
    fwd = tbl.read(spark, built_index, "forward").select(
        "docid", "doc_key", "role", "ts", "text"
    ).collect()
    rows = [
        (r.docid, r.doc_key, r.role, r.ts)
        for r in fwd
        if terms & set(tokenize_text(r.text))
    ]
    rows.sort(key=lambda t: (t[2], _neg_ts(t[3]), t[0]))
    return rows


def _neg_ts(ts):
    import datetime

    return -ts.timestamp() if isinstance(ts, datetime.datetime) else -ts


def test_full_order_matches_python_oracle(spark, built_index, tiny_transcripts):
    exp = _expected(tiny_transcripts, spark, built_index)
    assert len(exp) > 20
    got = sorted_search(
        spark, built_index, Q, SORT, size=len(exp) + 5, cfg=TEST_CFG
    ).collect()
    assert [(r.docid, r.doc_key, r.role, r.ts) for r in got] == exp


def test_pages_tile_field_order(spark, built_index, tiny_transcripts):
    exp = _expected(tiny_transcripts, spark, built_index)
    size = 9
    pages, after = [], None
    while len(pages) < len(exp):
        page = sorted_search(
            spark, built_index, Q, SORT, size=size, search_after=after, cfg=TEST_CFG
        ).collect()
        if not page:
            break
        pages.extend(page)
        last = page[-1]
        after = [last.role, last.ts, last.docid]
    assert [(r.docid, r.doc_key, r.role, r.ts) for r in pages] == exp
    # one more page past the end is empty
    assert (
        sorted_search(
            spark, built_index, Q, SORT, size=size, search_after=after, cfg=TEST_CFG
        ).count()
        == 0
    )


def test_cursor_is_strictly_after(spark, built_index):
    """A cursor equal to some hit's full tuple must exclude that hit."""
    first = sorted_search(spark, built_index, Q, SORT, size=1, cfg=TEST_CFG).collect()[0]
    nxt = sorted_search(
        spark,
        built_index,
        Q,
        SORT,
        size=1,
        search_after=[first.role, first.ts, first.docid],
        cfg=TEST_CFG,
    ).collect()[0]
    assert (nxt.docid, nxt.role, nxt.ts) != (first.docid, first.role, first.ts)


def test_validation(spark, built_index):
    with pytest.raises(ValueError):
        sorted_search(spark, built_index, Q, [], size=1, cfg=TEST_CFG)
    with pytest.raises(ValueError):
        sorted_search(spark, built_index, Q, [("role", "up")], size=1, cfg=TEST_CFG)
    with pytest.raises(ValueError):
        sorted_search(
            spark, built_index, Q, SORT, size=1, search_after=["user"], cfg=TEST_CFG
        )


def test_field_caps(spark, built_index):
    caps = field_caps(spark, [built_index])
    assert caps["text"]["searchable"] and caps["text"]["types"] == ["string"]
    assert caps["ts"]["types"] == ["timestamp"] and caps["ts"]["consistent"]
    assert set(caps) >= {"docid", "doc_key", "conv_id", "turn_idx", "role", "text", "ts"}
