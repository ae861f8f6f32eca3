"""_explain API: per-term breakdown reproduces the oracle's factors and
sums to the search score; deleted docs explain to nothing."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import bm25_topk, explain_score
from tests.conftest import TEST_CFG

Q = "w0 w3 zzznope"


@pytest.fixture(scope="module")
def fwd_rows(spark, built_index):
    return spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()


def test_explain_matches_oracle_factors(spark, built_index, fwd_rows):
    toks = {r.docid: tokenize_text(r.text) for r in fwd_rows}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    target = bm25_topk(spark, built_index, Q, k=1, cfg=TEST_CFG).collect()[0]
    rows = explain_score(spark, built_index, Q, target.docid, cfg=TEST_CFG).collect()
    assert {r.term for r in rows} <= {"w0", "w3"}  # unknown term absent
    tf = Counter(toks[target.docid])
    dl = len(toks[target.docid])
    total = 0.0
    for r in rows:
        df = sum(1 for ts in toks.values() if r.term in set(ts))
        want_idf = float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))
        want_norm = tf[r.term] / (tf[r.term] + 1.2 * (0.25 + 0.75 * dl / avgdl))
        assert r.tf == tf[r.term] and r.dl == dl and r.df == df
        assert math.isclose(r.idf, want_idf, abs_tol=1e-12)
        assert math.isclose(r.tf_norm, want_norm, abs_tol=1e-12)
        assert math.isclose(r.contrib, want_idf * want_norm, abs_tol=1e-12)
        total += r.contrib
    # the breakdown must sum to the ranked score
    assert math.isclose(total, target.score, abs_tol=1e-9)


def test_explain_non_matching_doc_is_empty(spark, built_index, fwd_rows):
    miss = next(
        r.docid for r in fwd_rows if not ({"w0", "w3"} & set(tokenize_text(r.text)))
    )
    assert explain_score(spark, built_index, Q, miss, cfg=TEST_CFG).count() == 0
    assert explain_score(spark, built_index, "", 0, cfg=TEST_CFG).count() == 0


def test_explain_deleted_doc_is_empty(spark, tiny_transcripts, tmp_path_factory):
    import shutil

    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.plans.deletes import delete_by_query

    d = str(tmp_path_factory.mktemp("explaindel") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, tiny_transcripts, d, TEST_CFG)
    hit = bm25_topk(spark, d, "w0", k=1, cfg=TEST_CFG).collect()[0]
    assert explain_score(spark, d, "w0", hit.docid, cfg=TEST_CFG).count() > 0
    delete_by_query(spark, d, doc_filter=f"docid = {hit.docid}", cfg=TEST_CFG)
    assert explain_score(spark, d, "w0", hit.docid, cfg=TEST_CFG).count() == 0
