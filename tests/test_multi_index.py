"""Multi-index dfs search: rank-identical to one merged index.

The rollover read-side contract: write to the newest generation, search
them ALL with globalized statistics (ES dfs_query_then_fetch across an
alias's indices).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mysql_es_spark import corpus
from mysql_es_spark.operators.query import bm25_topk
from mysql_es_spark.plans.alias import (
    list_generations,
    rollover,
    search_generations,
    set_alias,
)
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.plans.multi_index import bm25_topk_across
from tests.conftest import TEST_CFG

Q = "w0 w3 w11"


@pytest.fixture(scope="module")
def gens(spark, tmp_path_factory):
    """Alias with two populated generations holding DISJOINT conv sets,
    plus a monolithic index over the union corpus as the oracle."""
    base = tmp_path_factory.mktemp("gens")
    v1 = corpus.transcripts_df(spark, 500, seed=71)
    v2 = corpus.transcripts_df(spark, 400, seed=72).withColumn(
        "conv_id", F.concat(F.lit("g2"), F.col("conv_id"))
    )
    al = str(base / "writes")
    g0 = str(base / "writes-000000")
    build_index(spark, v1, g0, TEST_CFG)
    set_alias(al, g0)
    r = rollover(spark, al, cfg=TEST_CFG, max_docs=1)
    assert r["rolled"]
    # populate the new generation (the CDC/incremental write side)
    build_index(spark, v2, r["new_index"], TEST_CFG)

    mono = str(base / "mono")
    build_index(spark, v1.unionByName(v2), mono, TEST_CFG)
    return al, mono


def test_generation_search_rank_identical_to_monolithic(spark, gens):
    al, mono = gens
    got = search_generations(spark, al, Q, k=25, cfg=TEST_CFG).collect()
    want = bm25_topk(spark, mono, Q, k=25, cfg=TEST_CFG, with_keys=True).collect()
    # docids differ across layouts; compare by score sequence + doc identity
    # via each generation's forward table
    gen_dirs = list_generations(al)
    key_of = {}
    for label, d in gen_dirs.items():
        for r in spark.read.parquet(f"{d}/forward").select("docid", "doc_key").collect():
            key_of[(label, r.docid)] = r.doc_key
    got_keys = [key_of[(r["index"], r.docid)] for r in got]
    want_keys = [r.doc_key for r in want]
    assert got_keys == want_keys
    for g, w in zip(got, want):
        assert abs(g.score - w.score) < 1e-9
    # hits genuinely span both generations
    assert len({r["index"] for r in got}) == 2


def test_across_empty_and_unknown(spark, gens):
    al, _ = gens
    assert bm25_topk_across(spark, {}, Q).count() == 0
    assert search_generations(spark, al, "", cfg=TEST_CFG).count() == 0
    assert search_generations(spark, al, "zzzyqqq", cfg=TEST_CFG).count() == 0


def test_list_generations(spark, gens):
    al, _ = gens
    g = list_generations(al)
    assert sorted(g) == ["writes-000000", "writes-000001"]


def test_indices_boost(spark, gens):
    al, _mono = gens
    # build the label->dir map the way search_generations does
    import os

    base = os.path.dirname(al)
    labels = {g: os.path.join(base, g) for g in list_generations(al)}
    plain = bm25_topk_across(spark, labels, Q, k=50, cfg=TEST_CFG).collect()
    first = sorted(labels)[0]
    boosted = bm25_topk_across(
        spark, labels, Q, k=50, cfg=TEST_CFG, boosts={first: 2.0}
    ).collect()
    pm = {(r["index"], r.docid): r.score for r in plain}
    bm = {(r["index"], r.docid): r.score for r in boosted}
    shared = set(pm) & set(bm)
    assert shared, "need overlapping results to compare"
    for key in shared:
        want = pm[key] * 2.0 if key[0] == first else pm[key]
        assert bm[key] == pytest.approx(want, rel=1e-9)
    # boosted ordering follows the boosted scores
    got_order = [(r["index"], r.docid) for r in boosted]
    assert got_order == sorted(
        got_order, key=lambda t: (-bm[t], t[0], t[1])
    )


def test_suggest_completion(spark, gens):
    from collections import Counter

    from mysql_es_spark.functions.analyze import tokenize_text
    from mysql_es_spark.operators.query import suggest_completion

    _al, mono = gens
    fwd = spark.read.parquet(f"{mono}/forward").select("text").collect()
    df = Counter(
        t for r in fwd for t in set(tokenize_text(r.text or ""))
    )
    want = sorted(
        ((t, n) for t, n in df.items() if t.startswith("w1")),
        key=lambda x: (-x[1], x[0]),
    )[:6]
    got = suggest_completion(spark, mono, "w1", size=6).collect()
    assert [(r.suggestion, r.weight) for r in got] == want
    assert suggest_completion(spark, mono, "", size=5).count() == 0
