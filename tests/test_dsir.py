"""DSIR importance weights / Gumbel resample + temperature domain mix."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.operators.sampling import (
    dsir_logweights,
    dsir_select,
    temperature_mix,
)


def _h32(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) % (2**32)


@pytest.fixture(scope="module")
def docs(spark):
    # two clear domains: 'code'-flavored vs 'prose'-flavored vocab
    rows = []
    for i in range(200):
        if i % 2 == 0:
            txt = f"def spark_fn_{i}(): return join(shuffle(df), broadcast(dim))"
            src = "code"
        else:
            txt = f"the quick brown fox number {i} jumps over the lazy dog again"
            src = "prose"
        rows.append((i, txt, src))
    rows.append((999, "", "prose"))  # zero-token doc
    return spark.createDataFrame(rows, "doc_id long, text string, source string").cache()


def test_dsir_weights_separate_domains(docs):
    w = dsir_logweights(docs, F.col("source") == "code", n_buckets=512)
    rows = {r.doc_id: r for r in w.collect()}
    assert len(rows) == 201
    # zero-token doc: weight 0, n_tokens 0
    assert rows[999].n_tokens == 0 and rows[999].dsir_logw == 0.0
    code = [rows[i].dsir_logw for i in range(0, 200, 2)]
    prose = [rows[i].dsir_logw for i in range(1, 200, 2)]
    # every code doc should look more target-like than every prose doc
    assert min(code) > max(prose)
    assert all(v > 0 for v in code) and all(v < 0 for v in prose)


def test_dsir_weights_zero_sum_identity(docs):
    # with target == everything, p_tgt == p_raw => all weights exactly 0
    w = dsir_logweights(docs, F.lit(True), n_buckets=128)
    assert all(abs(r.dsir_logw) < 1e-12 for r in w.collect())


def test_dsir_select_gumbel_matches_python(docs):
    w = dsir_logweights(docs, F.col("source") == "code", n_buckets=512)
    got = [(r.doc_id, r.gumbel_key) for r in dsir_select(w, k=25, seed="s1").collect()]
    assert len(got) == 25
    # recompute keys in python from the collected weights
    wl = {r.doc_id: r.dsir_logw for r in w.collect()}
    keys = {}
    for d, lw in wl.items():
        u = (_h32(f"s1:{d}") + 0.5) / 2**32
        keys[d] = lw + (-math.log(-math.log(u)))
    want = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-9
    # code docs dominate the resample (weights are strongly separated)
    n_code = sum(1 for d, _ in got if d != 999 and d % 2 == 0)
    assert n_code >= 20


def test_temperature_mix_counts(docs):
    # skew: 180 prose-like vs 20 code rows
    skew = docs.filter((F.col("doc_id") % 10 < 1) | (F.col("source") == "prose"))
    n = {r.source: r.n for r in skew.groupBy("source").agg(F.count("*").alias("n")).collect()}
    out = temperature_mix(skew, "source", tau=0.5, id_col="doc_id")
    got = Counter(r.source for r in out.collect())
    tot = sum(n.values())
    z = sum(v**0.5 for v in n.values())
    for s, ns in n.items():
        want = tot * (ns**0.5) / z
        # fractional-pass thresholding is exact in expectation; md5 noise
        # is one Bernoulli per row => tolerance ~ sqrt(n)
        assert abs(got[s] - want) <= 3 * math.sqrt(ns) + 2
    # (id, epoch) pairs unique
    pairs = Counter((r.doc_id, r.epoch) for r in out.collect())
    assert all(v == 1 for v in pairs.values())


def test_temperature_mix_tau1_is_identity_mix(docs):
    out = temperature_mix(docs, "source", tau=1.0, id_col="doc_id")
    # tau=1, budget=input => e_s == 1 for every stratum: exact identity
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in docs.collect()
    )
    assert out.filter(F.col("epoch") != 0).count() == 0
