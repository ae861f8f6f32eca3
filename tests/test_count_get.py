"""_count and _mget surfaces over the index."""

from __future__ import annotations

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import get_docs, match_count
from tests.conftest import TEST_CFG

Q = "w0 w3"


def test_match_count(spark, built_index):
    fwd = spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    qt = set(Q.split())
    want = sum(1 for r in fwd if qt & set(tokenize_text(r.text)))
    got = match_count(spark, built_index, Q, cfg=TEST_CFG).collect()[0]
    assert got.n_matches == want and want > 0
    assert match_count(spark, built_index, "", cfg=TEST_CFG).collect()[0].n_matches == 0
    assert (
        match_count(spark, built_index, "zzzyqq", cfg=TEST_CFG).collect()[0].n_matches
        == 0
    )


def test_get_docs(spark, built_index):
    fwd = spark.read.parquet(f"{built_index}/forward").limit(5).collect()
    keys = [r.doc_key for r in fwd[:3]]
    got = {r.doc_key: r for r in get_docs(spark, built_index, keys).collect()}
    assert set(got) == set(keys)
    for r in fwd[:3]:
        assert got[r.doc_key].text == r.text and got[r.doc_key].conv_id == r.conv_id
    assert get_docs(spark, built_index, ["nope:999"]).count() == 0
