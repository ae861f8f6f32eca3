"""Head-term skew handling (north rule): a Zipf head term's postings must
split across range salts — independent reducers, no single-owner hotspot —
while staying globally docid-ordered so no merge phase exists."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysql_es_spark.functions.codecs import decode_block
from tests.conftest import TEST_CFG


def test_head_term_splits_across_salts(spark, built_index):
    blk = spark.read.parquet(f"{built_index}/postings")
    per_term = (
        blk.groupBy("term")
        .agg(
            F.count_distinct("salt").alias("n_salts"),
            F.sum("n").alias("df"),
        )
        .orderBy(F.col("df").desc())
        .limit(5)
        .collect()
    )
    # the corpus Zipf head terms (w0, w1, …) have df ≫ salt_docs=256, so
    # each must occupy several salt ranges
    for r in per_term:
        assert r["n_salts"] >= 2, (r["term"], r["n_salts"], r["df"])
        assert r["df"] > TEST_CFG.salt_docs


def test_salt_ranges_are_disjoint_and_ordered(spark, built_index):
    """Blocks of one term, ordered by (salt, start_docid), decode to a
    strictly ascending global docid sequence — the no-merge invariant."""
    head = (
        spark.read.parquet(f"{built_index}/postings")
        .groupBy("term")
        .agg(F.sum("n").alias("df"))
        .orderBy(F.col("df").desc())
        .limit(1)
        .collect()[0]["term"]
    )
    rows = (
        spark.read.parquet(f"{built_index}/postings")
        .filter(F.col("term") == head)
        .orderBy("salt", "start_docid")
        .collect()
    )
    all_ids = np.concatenate(
        [decode_block(r["blob"], r["n"])[0] for r in rows]
    )
    assert (np.diff(all_ids) > 0).all()  # strictly ascending, no overlap
    # every posting's salt matches its docid range
    for r in rows:
        ids = decode_block(r["blob"], r["n"])[0]
        assert (ids // TEST_CFG.salt_docs == r["salt"]).all()
