"""End-to-end T1 edge-ngram index: build with the ngram analyzer on, then
serve prefix (search-as-you-type) queries — the reference's actual use of
edge-ngrams (template.json:9-19 index analyzer vs :20-28 search analyzer,
applied to name/phone fields :74-96). The *query* side stays T2 (no
ngrams), so a short query term like "spa" hits the indexed grams of
"spark"/"spartan" but not "spoon"."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.operators.query import bm25_topk
from mysql_es_spark.plans.build import build_index

NGRAM_CFG = IndexConfig(
    n_buckets=2, wave_size=2, salt_docs=256, term_buckets=4,
    edge_ngram=True, edge_ngram_min=2, edge_ngram_max=25,
)

DOCS = [
    ("c0", "spark streaming pipeline"),
    ("c1", "spartan discipline"),
    ("c2", "spoon and fork"),
    ("c3", "banana bread recipe"),
]


@pytest.fixture(scope="module")
def ngram_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ngram") / "ix")
    df = spark.createDataFrame(
        [
            (cid, 0, "user", text, None, datetime(2026, 1, 1))
            for cid, text in DOCS
        ],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, NGRAM_CFG)
    return d


def _hits(spark, ix, q, k=10):
    top = bm25_topk(spark, ix, q, k=k, cfg=NGRAM_CFG, mode="pruned", with_keys=True)
    return {r.conv_id for r in top.collect()}


def test_prefix_query_matches_gram_owners(spark, ngram_index):
    assert _hits(spark, ngram_index, "spa") == {"c0", "c1"}
    assert _hits(spark, ngram_index, "spar") == {"c0", "c1"}
    assert _hits(spark, ngram_index, "spark") == {"c0"}
    assert _hits(spark, ngram_index, "spo") == {"c2"}
    assert _hits(spark, ngram_index, "ban") == {"c3"}
    # "sp" is a shared gram of spark/spartan/spoon
    assert _hits(spark, ngram_index, "sp") == {"c0", "c1", "c2"}


def test_ngram_index_pruned_equals_simple(spark, ngram_index):
    for q in ["spa", "sp ban", "banana"]:
        simple = [
            (r.docid, round(r.score, 9))
            for r in bm25_topk(spark, ngram_index, q, k=10, cfg=NGRAM_CFG, mode="simple").collect()
        ]
        pruned = [
            (r.docid, round(r.score, 9))
            for r in bm25_topk(spark, ngram_index, q, k=10, cfg=NGRAM_CFG, mode="pruned").collect()
        ]
        assert simple == pruned


def test_ngram_doc_lens_count_grams(spark, ngram_index):
    """dl under T1 counts unique grams, so avgdl/N reflect the expanded
    token stream (what BM25 normalizes against in the ngram index)."""
    stats = spark.read.parquet(f"{ngram_index}/corpus_stats").collect()[0]
    assert stats["n_docs"] == len(DOCS)
    from mysql_es_spark.functions.analyze import edge_ngrams, tokenize_text

    want_sum = sum(len(edge_ngrams(tokenize_text(t), 2, 25)) for _, t in DOCS)
    dl_sum = (
        spark.read.parquet(f"{ngram_index}/doc_lens")
        .agg(F.sum("dl").alias("s"))
        .collect()[0]["s"]
    )
    assert dl_sum == want_sum == stats["sum_dl"]
