"""random_sampler / bucket_correlation / change_point aggs +
terms-lookup query + kNN similarity floor — Python oracles."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators import aggs
from mysql_es_spark.operators.query import query_terms, terms_lookup_topk
from mysql_es_spark.operators.similarity import cosine_topk
from tests.conftest import TEST_CFG

Q = "w0 w3"


def _h32(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) % (2**32)


@pytest.fixture(scope="module")
def fwd(spark, built_index):
    rows = (
        spark.read.parquet(f"{built_index}/forward")
        .select("docid", "conv_id", "ts", "text")
        .collect()
    )
    return {r.docid: r for r in rows}


@pytest.fixture(scope="module")
def matched(fwd):
    qt = set(query_terms(Q))
    return {d for d, r in fwd.items() if qt & set(tokenize_text(r.text))}


def test_random_sampler(spark, built_index, fwd, matched):
    p = 0.5
    thr = int(round(p * 2**32))
    samp = [d for d in matched if _h32(f"rs:{fwd[d].conv_id}") < thr]
    row = aggs.random_sampler_agg(
        spark, built_index, Q, probability=p, seed="rs", cfg=TEST_CFG
    ).collect()[0]
    assert row.n_sampled == len(samp)
    assert row.doc_count == round(len(samp) / p)
    want_avg = np.mean([len(tokenize_text(fwd[d].text)) for d in samp])
    assert abs(row.avg_dl - want_avg) < 1e-9
    # sample is a strict subset for p<1 on a non-tiny match set
    assert 0 < row.n_sampled < len(matched)


def test_random_sampler_bad_p(spark, built_index):
    with pytest.raises(ValueError):
        aggs.random_sampler_agg(spark, built_index, Q, probability=0.0, cfg=TEST_CFG)


def _hist(fwd, matched):
    # minute buckets: the 1200-turn fixture spans ~3 hours, so days/hours
    # are too coarse to exercise the bucket-stream aggs
    c = Counter(fwd[d].ts.strftime("%Y-%m-%d %H:%M:00") for d in matched)
    return [v for _, v in sorted(c.items())]


def test_bucket_correlation_perfect_and_inverse(spark, built_index, fwd, matched):
    counts = _hist(fwd, matched)
    row = aggs.bucket_correlation_agg(
        spark, built_index, Q, [float(v) for v in counts], interval="minute", cfg=TEST_CFG
    ).collect()[0]
    assert row.n_buckets == len(counts)
    assert abs(row.corr - 1.0) < 1e-9
    row2 = aggs.bucket_correlation_agg(
        spark, built_index, Q, [-float(v) for v in counts], interval="minute", cfg=TEST_CFG
    ).collect()[0]
    assert abs(row2.corr + 1.0) < 1e-9


def test_bucket_correlation_length_mismatch(spark, built_index):
    with pytest.raises(ValueError):
        aggs.bucket_correlation_agg(
            spark, built_index, Q, [1.0, 2.0, 3.0], cfg=TEST_CFG
        )


def test_change_point_matches_python(spark, built_index, fwd, matched):
    vs = [float(v) for v in _hist(fwd, matched)]
    periods = sorted({fwd[d].ts.strftime("%Y-%m-%d %H:%M:00") for d in matched})
    best = None
    for i in range(2, len(vs) - 1):
        pre, suf = np.array(vs[:i]), np.array(vs[i:])
        den = math.sqrt(pre.var() / len(pre) + suf.var() / len(suf))
        if den == 0:
            continue
        stat = (suf.mean() - pre.mean()) / den
        key = (round(abs(stat), 6), periods[i])
        if best is None or key[0] > best[0] or (key[0] == best[0] and key[1] < best[1]):
            best = (key[0], key[1], stat)
    row = aggs.change_point_agg(
        spark, built_index, Q, interval="minute", cfg=TEST_CFG
    ).collect()[0]
    assert row.period == best[1]
    assert abs(row.stat - round(best[2], 4)) < 1e-9
    assert row.type == ("step_up" if best[2] >= 0 else "step_down")


def test_terms_lookup(spark, built_index, fwd):
    docs = spark.createDataFrame(
        [(1, "w0 w3 zzz"), (2, "nothing here")], "lid long, text string"
    )
    top = terms_lookup_topk(
        spark, built_index, docs, F.col("lid") == 1, k=10_000, boost=2.0, cfg=TEST_CFG
    ).collect()
    qt = {"w0", "w3", "zzz"}
    want = sorted(d for d, r in fwd.items() if qt & set(tokenize_text(r.text)))
    assert sorted(r.docid for r in top) == want
    assert all(r.score == 2.0 for r in top)
    # lookup must resolve to exactly one doc
    with pytest.raises(ValueError):
        terms_lookup_topk(spark, built_index, docs, F.col("lid") > 0, cfg=TEST_CFG)
    with pytest.raises(ValueError):
        terms_lookup_topk(spark, built_index, docs, F.col("lid") == 99, cfg=TEST_CFG)


def test_knn_min_sim_floor(spark):
    rows = [(i, [math.cos(i * 0.3), math.sin(i * 0.3)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.0]
    full = cosine_topk(emb, q, k=20).collect()
    floored = cosine_topk(emb, q, k=20, min_sim=0.5).collect()
    want = [r for r in full if r.cos >= 0.5]
    assert [(r.vec_id, r.cos) for r in floored] == [(r.vec_id, r.cos) for r in want]
    assert 0 < len(floored) < 20  # genuinely short page
