"""Seeded deterministic shuffle: engine-portable permutation, shard
writes replay the exact global order, fresh seed = fresh permutation."""

from __future__ import annotations

import glob
import hashlib

from mysql_es_spark.operators.sampling import seeded_shuffle, write_shuffled


def _py_perm(ids, seed):
    return sorted(ids, key=lambda i: (hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), i))


def test_permutation_matches_python_and_partitioning(spark, tiny_transcripts):
    df = tiny_transcripts.select("conv_id", "turn_idx").withColumn(
        "rid", tiny_transcripts.conv_id
    ).select("rid").distinct()
    ids = [r.rid for r in df.collect()]
    got = [
        r.rid
        for r in seeded_shuffle(df, "epoch-1", id_col="rid")
        .orderBy("shuffle_key", "rid")
        .collect()
    ]
    assert got == _py_perm(ids, "epoch-1")
    # invariant under repartitioning
    got2 = [
        r.rid
        for r in seeded_shuffle(df.repartition(7), "epoch-1", id_col="rid")
        .orderBy("shuffle_key", "rid")
        .collect()
    ]
    assert got2 == got
    # a different seed is a different permutation of the same set
    other = [
        r.rid
        for r in seeded_shuffle(df, "epoch-2", id_col="rid")
        .orderBy("shuffle_key", "rid")
        .collect()
    ]
    assert sorted(other) == sorted(got) and other != got


def test_write_shuffled_replays_global_order(spark, tiny_transcripts, tmp_path):
    df = tiny_transcripts.select("conv_id").distinct().withColumnRenamed("conv_id", "rid")
    out = str(tmp_path / "shards")
    write_shuffled(df, out, "ep7", n_shards=4, id_col="rid")
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    replay = []
    for f in files:
        part = spark.read.parquet(f).collect()
        keys = [(r.shuffle_key, r.rid) for r in part]
        assert keys == sorted(keys), "rows inside a shard must be key-sorted"
        replay.extend(r.rid for r in part)
    expected = [
        r.rid
        for r in seeded_shuffle(df, "ep7", id_col="rid").orderBy("shuffle_key", "rid").collect()
    ]
    assert replay == expected, "filename-order concat must be the global permutation"
