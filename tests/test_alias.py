"""Index aliases: pointer resolution, atomic swap, cache invalidation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.operators.query import bm25_topk, index_stats
from mysql_es_spark.plans.alias import get_alias, set_alias
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.plans.deletes import reindex
from tests.conftest import TEST_CFG


def test_alias_swap(spark, tiny_transcripts, tmp_path_factory):
    base = tmp_path_factory.mktemp("aliases")
    ix_a = str(base / "ix_v1")
    alias = str(base / "live")
    build_index(spark, tiny_transcripts, ix_a, TEST_CFG)

    set_alias(alias, ix_a)
    assert get_alias(alias) is not None
    full = bm25_topk(spark, alias, "w0 w3", k=5, cfg=TEST_CFG).collect()
    direct = bm25_topk(spark, ix_a, "w0 w3", k=5, cfg=TEST_CFG).collect()
    assert [(r.docid, r.score) for r in full] == [(r.docid, r.score) for r in direct]
    n_v1 = index_stats(spark, alias)["n_docs"]

    # build-aside (reindex to the docs containing w0 only), then swap
    ix_b = str(base / "ix_v2")
    reindex(spark, ix_a, ix_b, query="w0")
    set_alias(alias, ix_b)
    n_v2 = index_stats(spark, alias)["n_docs"]
    assert 0 < n_v2 < n_v1  # the swap is visible (stats cache invalidated)
    swapped = bm25_topk(spark, alias, "w0 w3", k=5, cfg=TEST_CFG).collect()
    want = bm25_topk(spark, ix_b, "w0 w3", k=5, cfg=TEST_CFG).collect()
    assert [(r.docid, r.score) for r in swapped] == [(r.docid, r.score) for r in want]


def test_alias_over_hadoop_scheme(spark, built_index, tmp_path_factory):
    """Round-5 object-storage control plane: an alias ADDRESSED via a
    scheme:// path must resolve on the query path. file:// forces the
    Hadoop FileSystem backend (the same code path as s3a://); previously
    resolve()/alias_filter() did os.path.isfile on the URI string and
    silently treated the alias as a real (missing) index."""
    from mysql_es_spark.sources import fsio
    from mysql_es_spark.sources import tables as tbl

    base = tmp_path_factory.mktemp("aliases_h")
    alias_local = str(base / "hlive")
    alias = "file://" + alias_local
    # pointer written AND read through the Hadoop backend
    set_alias(alias, built_index)
    assert fsio.isfile(fsio.join(alias, tbl.ALIAS_FILE))
    assert get_alias(alias) == built_index
    got = bm25_topk(spark, alias, "w0 w3", k=5, cfg=TEST_CFG).collect()
    want = bm25_topk(spark, built_index, "w0 w3", k=5, cfg=TEST_CFG).collect()
    assert [(r.docid, r.score) for r in got] == [(r.docid, r.score) for r in want]
    # the same alias via its plain path resolves identically (one
    # canonical scan-cache entry for both spellings)
    assert get_alias(alias_local) == built_index
    # filtered alias over the scheme too
    falias = "file://" + str(base / "hfiltered")
    set_alias(falias, built_index, doc_filter="role = 'user'")
    assert tbl.alias_filter(falias) == "role = 'user'"


def test_alias_validation(spark, tiny_transcripts, tmp_path_factory):
    base = tmp_path_factory.mktemp("aliases2")
    ix = str(base / "ix")
    build_index(spark, tiny_transcripts, ix, TEST_CFG)
    alias = str(base / "live")
    set_alias(alias, ix)
    with pytest.raises(ValueError):
        set_alias(str(base / "other"), alias)  # no chains
    with pytest.raises(ValueError):
        set_alias(str(base / "x"), str(base / "does_not_exist"))
    assert get_alias(ix) is None  # a real index is not an alias


def test_filtered_alias(spark, built_index, tmp_path_factory):
    from mysql_es_spark.operators.query import bm25_filtered_topk, match_count, match_export
    from mysql_es_spark.sources.tables import alias_filter

    base = tmp_path_factory.mktemp("aliases3")
    alias = str(base / "en_only")
    set_alias(alias, built_index, doc_filter="role = 'user'")
    assert alias_filter(alias) == "role = 'user'"
    assert alias_filter(built_index) is None

    # bm25_topk through the filtered alias == explicit filter-context search
    got = bm25_topk(spark, alias, "w0 w3", k=8, cfg=TEST_CFG).collect()
    want = bm25_filtered_topk(
        spark, built_index, "w0 w3", "role = 'user'", k=8, cfg=TEST_CFG
    ).collect()
    assert [(r.docid, round(r.score, 9)) for r in got] == [
        (r.docid, round(r.score, 9)) for r in want
    ]
    assert got  # non-trivial
    # every hit satisfies the filter
    hit_roles = {
        r.role
        for r in spark.read.parquet(f"{built_index}/forward")
        .filter(F.col("docid").isin([d.docid for d in got]))
        .select("role")
        .collect()
    }
    assert hit_roles == {"user"}

    # match_count honors the filter
    n_all = match_count(spark, built_index, "w0 w3", cfg=TEST_CFG).collect()[0][0]
    n_flt = match_count(spark, alias, "w0 w3", cfg=TEST_CFG).collect()[0][0]
    assert 0 < n_flt < n_all

    # match_export honors it too and agrees with the count
    n_exp = match_export(spark, alias, "w0 w3", cfg=TEST_CFG).count()
    assert n_exp == n_flt

    # direct filter-context calls AND the alias predicate
    both = bm25_filtered_topk(
        spark, alias, "w0 w3", "turn_idx >= 0", k=8, cfg=TEST_CFG
    ).collect()
    assert [(r.docid, round(r.score, 9)) for r in both] == [
        (r.docid, round(r.score, 9)) for r in want
    ]

    # unsupported combinations fail loudly instead of ignoring the filter
    with pytest.raises(ValueError):
        bm25_topk(spark, alias, "w0 w3", k=8, cfg=TEST_CFG, min_score=0.1)
    with pytest.raises(ValueError):
        set_alias(alias, built_index, doc_filter="a\nb")


def test_resolve_name(spark, built_index, tmp_path):
    from mysql_es_spark.plans.alias import resolve_name, set_alias

    r = resolve_name(built_index)
    assert r["type"] == "index" and r["target"].endswith(built_index.split("/")[-1])

    a = str(tmp_path / "al")
    set_alias(a, built_index)
    ra = resolve_name(a)
    assert ra["type"] == "alias" and ra["target"] == os.path.abspath(built_index)

    f = str(tmp_path / "alf")
    set_alias(f, built_index, doc_filter="role = 'en'")
    assert resolve_name(f)["filtered"] is True

    assert resolve_name(str(tmp_path / "nope"))["type"] == "missing"


def test_resolve_name_data_stream(spark, tmp_path):
    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.corpus import transcripts_df
    from mysql_es_spark.plans.alias import resolve_name
    from mysql_es_spark.plans.data_stream import append_batch, create_data_stream

    ds = str(tmp_path / "rs")
    create_data_stream(
        spark, ds, IndexConfig(n_buckets=4, wave_size=4, salt_docs=256, term_buckets=8)
    )
    append_batch(spark, ds, transcripts_df(spark, 60, seed=2))
    r = resolve_name(ds)
    assert r["type"] == "data_stream" and len(r["generations"]) == 2
