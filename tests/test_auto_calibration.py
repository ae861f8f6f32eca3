"""mode="auto" decode-rate calibration (round 5): the crossover
threshold comes from a build-time measured decode throughput persisted
in index_meta instead of a hand-set knob — when the index is big enough
to measure; small indexes keep the static default. Routing identity
(auto == pruned == simple) is pinned elsewhere (test_profile); these
tests cover the calibration mechanics."""

from __future__ import annotations

from mysql_es_spark.config import DEFAULT, IndexConfig
from mysql_es_spark.operators.query import (
    _RATE_CACHE,
    auto_threshold,
    bm25_topk,
    effective_config,
)
from mysql_es_spark.plans.build import _decode_probe
from tests.conftest import TEST_CFG


def test_small_index_not_calibrated(spark, built_index):
    """The test fixture corpus can't supply min_rows probe postings, so
    index_meta stores NULL and auto keeps the static threshold."""
    import pyspark.sql.functions as F

    meta = spark.read.parquet(f"{built_index}/index_meta")
    assert "decode_rows_per_sec" in meta.columns
    assert meta.collect()[0]["decode_rows_per_sec"] is None
    cfg = effective_config(spark, built_index, TEST_CFG)
    assert auto_threshold(built_index, cfg) == DEFAULT.auto_pruned_min_postings
    prof: dict = {}
    bm25_topk(spark, built_index, "w0 w3", k=5, cfg=TEST_CFG, mode="auto",
              profile=prof).collect()
    assert prof["auto_threshold"] == DEFAULT.auto_pruned_min_postings
    assert prof["auto_chose"] == "simple"


def test_probe_measures_on_small_index(spark, built_index):
    """_decode_probe with a relaxed floor must return a positive,
    sane rate on the fixture index (the mechanics, not the policy)."""
    cfg = effective_config(spark, built_index, TEST_CFG)
    stats = spark.read.parquet(f"{built_index}/corpus_stats").collect()[0]
    avgdl = stats["sum_dl"] / stats["n_docs"]
    rate = _decode_probe(
        spark, built_index, cfg, avgdl, stats["n_docs"], cap=10_000, min_rows=10
    )
    assert rate is not None and rate > 0
    # and the policy floor: the same probe at the real floor declines
    assert _decode_probe(spark, built_index, cfg, avgdl, stats["n_docs"]) is None


def test_calibrated_rate_routes_auto(spark, built_index):
    """With a (simulated) measured rate in the cache, auto's threshold
    becomes rate × budget: a tiny rate routes the head query to pruned,
    a huge rate to simple, and an explicit caller knob still wins."""
    cfg = effective_config(spark, built_index, TEST_CFG)
    try:
        _RATE_CACHE[built_index] = 1.0  # 1 row/sec → threshold 2
        prof: dict = {}
        bm25_topk(spark, built_index, "w0 w3", k=5, cfg=TEST_CFG, mode="auto",
                  profile=prof).collect()
        assert prof["auto_threshold"] == int(1.0 * cfg.auto_latency_budget_sec)
        assert prof["auto_chose"] == "pruned"

        _RATE_CACHE[built_index] = 1e12
        prof = {}
        bm25_topk(spark, built_index, "w0 w3", k=5, cfg=TEST_CFG, mode="auto",
                  profile=prof).collect()
        assert prof["auto_chose"] == "simple"

        # explicit caller threshold overrides calibration entirely
        _RATE_CACHE[built_index] = 1.0
        explicit = TEST_CFG.with_(auto_pruned_min_postings=1 << 30)
        prof = {}
        bm25_topk(spark, built_index, "w0 w3", k=5, cfg=explicit, mode="auto",
                  profile=prof).collect()
        assert prof["auto_threshold"] == 1 << 30
        assert prof["auto_chose"] == "simple"
    finally:
        _RATE_CACHE.pop(built_index, None)


def test_budget_knob_scales_threshold(spark, built_index):
    effective_config(spark, built_index, TEST_CFG)
    try:
        _RATE_CACHE[built_index] = 1000.0
        cfg = effective_config(spark, built_index, TEST_CFG.with_(auto_latency_budget_sec=5.0))
        assert auto_threshold(built_index, cfg) == 5000
    finally:
        _RATE_CACHE.pop(built_index, None)


def test_rate_survives_refinalize(spark, tiny_transcripts, tmp_path):
    """Re-finalize (incremental ticks) must reuse a stored rate, not
    re-probe: a planted rate in index_meta survives finalize()."""
    import pyspark.sql.functions as F

    from mysql_es_spark.plans.build import build_index, finalize
    from mysql_es_spark.sources import tables as tbl

    ix = str(tmp_path / "ix")
    cfg = IndexConfig(n_buckets=2, wave_size=2, salt_docs=512)
    build_index(spark, tiny_transcripts, ix, cfg)
    # plant a rate (as a big index's first finalize would have measured)
    meta = spark.read.parquet(f"{ix}/index_meta").withColumn(
        "decode_rows_per_sec", F.lit(123456.0)
    )
    pdf = meta.toPandas()
    spark.createDataFrame(pdf, schema=tbl.INDEX_META_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{ix}/index_meta")
    finalize(spark, ix, cfg)
    got = spark.read.parquet(f"{ix}/index_meta").collect()[0]["decode_rows_per_sec"]
    assert got == 123456.0
