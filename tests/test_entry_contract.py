"""Driver-contract smoke: entry() yields rows; queries()/oracle_sql() are
consistent; a few queries run at sf0.001."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q
    assert len(q) >= 40


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"docid", "score", "doc_key", "conv_id"} <= set(df.columns)


@pytest.mark.parametrize(
    "name",
    ["p1_projection_filter", "j4_multihop_join", "q1_pricing_summary", "bm25_direct",
     "doc_token_count", "emb_cosine_topk"],
)
def test_queries_run_at_sf0001(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF)
    assert df.count() >= 0
