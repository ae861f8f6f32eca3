from __future__ import annotations

import shutil

import pytest

from mysql_es_spark import corpus
from mysql_es_spark.config import IndexConfig
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.session import get_spark

TEST_CFG = IndexConfig(n_buckets=4, wave_size=2, salt_docs=256, term_buckets=8, block_size=64)
N_TURNS = 1200


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="mysql_es_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    return corpus.transcripts_df(spark, N_TURNS, seed=42).cache()


@pytest.fixture(scope="session")
def built_index(spark, tiny_transcripts, tmp_path_factory):
    """One shared index build used by all rank-identity/query tests."""
    d = str(tmp_path_factory.mktemp("index") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, tiny_transcripts, d, TEST_CFG)
    return d
