"""Rollover: condition-gated generation rotation behind an alias."""

from __future__ import annotations

import os

import pytest

from mysql_es_spark.operators.query import bm25_topk
from mysql_es_spark.plans.alias import get_alias, rollover, set_alias
from tests.conftest import TEST_CFG


def test_rollover_generations(spark, built_index, tmp_path):
    al = str(tmp_path / "writes")
    set_alias(al, built_index)

    # condition not met: nothing changes
    r = rollover(spark, al, cfg=TEST_CFG, max_docs=10**9)
    assert not r["rolled"] and get_alias(al) == os.path.abspath(built_index)
    assert r["n_docs"] > 0 and r["bytes"] > 0

    # condition met: new empty generation, alias swapped atomically
    r = rollover(spark, al, cfg=TEST_CFG, max_docs=1)
    assert r["rolled"] and r["new_index"].endswith("writes-000001")
    assert get_alias(al) == r["new_index"]
    # the fresh write index is empty but fully queryable — including the
    # pruned mode, which reads the (file-empty) postings table before
    # consulting the dictionary (regression: empty-table schema fallback)
    assert bm25_topk(spark, al, "w0", k=5, cfg=TEST_CFG).count() == 0
    assert bm25_topk(spark, al, "w0", k=5, cfg=TEST_CFG, mode="pruned").count() == 0
    # the old generation keeps serving by its real path
    assert bm25_topk(spark, built_index, "w0", k=5, cfg=TEST_CFG).count() > 0

    # generation counter increments from the current target's suffix
    r2 = rollover(spark, al, cfg=TEST_CFG, max_docs=0)
    assert r2["rolled"] and r2["new_index"].endswith("writes-000002")
    assert get_alias(al) == r2["new_index"]


def test_rollover_validation(spark, built_index, tmp_path):
    with pytest.raises(ValueError):
        rollover(spark, built_index, max_docs=1)  # not an alias
    al = str(tmp_path / "a2")
    set_alias(al, built_index)
    with pytest.raises(ValueError):
        rollover(spark, al)  # no condition


def test_rollover_inherits_physical_config(spark, tiny_transcripts, tmp_path):
    """A rollover without an explicit cfg must clone the old generation's
    persisted physical layout (positions and all), not defaults."""
    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.operators.query import phrase_topk
    from mysql_es_spark.plans.build import build_index

    pos_cfg = IndexConfig(
        n_buckets=4, wave_size=2, salt_docs=256, term_buckets=8, with_positions=True
    )
    g0 = str(tmp_path / "al-000000")
    build_index(spark, tiny_transcripts.limit(150), g0, pos_cfg)
    al = str(tmp_path / "al")
    set_alias(al, g0)
    r = rollover(spark, al, max_docs=1)  # cfg=None → inherit
    assert r["rolled"]
    meta = spark.read.parquet(f"{r['new_index']}/index_meta").collect()[0]
    assert meta["with_positions"] and meta["n_buckets"] == 4
    # phrase queries keep working on the (empty) new write index
    assert phrase_topk(spark, al, "w0 w1", cfg=pos_cfg).count() == 0
