"""Data streams: append-only generations, global search, retention."""

from __future__ import annotations

import os

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.corpus import transcripts_df
from mysql_es_spark.operators.query import bm25_topk
from mysql_es_spark.plans.build import build_index
from mysql_es_spark.plans.data_stream import (
    append_batch,
    create_data_stream,
    expire_generations,
    search_stream,
)

CFG = IndexConfig(n_buckets=4, wave_size=4, salt_docs=256, term_buckets=8)


@pytest.fixture(scope="module")
def stream(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    ds = str(root / "convs")
    create_data_stream(spark, ds, CFG)
    full = transcripts_df(spark, 900, seed=19)
    convs = [r.conv_id for r in full.select("conv_id").distinct().collect()]
    convs.sort()
    cut1, cut2 = convs[len(convs) // 3], convs[2 * len(convs) // 3]
    b1 = full.filter(full.conv_id <= cut1)
    b2 = full.filter((full.conv_id > cut1) & (full.conv_id <= cut2))
    b3 = full.filter(full.conv_id > cut2)
    g1 = append_batch(spark, ds, b1)
    g2 = append_batch(spark, ds, b2)
    g3 = append_batch(spark, ds, b3)
    return ds, full, (g1, g2, g3)


def test_generations_sequence_and_alias(stream):
    ds, _full, gens = stream
    names = [os.path.basename(g["generation"]) for g in gens]
    assert names == ["convs-000002", "convs-000003", "convs-000004"]
    from mysql_es_spark.plans.alias import get_alias

    assert get_alias(ds).endswith("convs-000004")


def test_search_rank_identical_to_monolithic(spark, stream, tmp_path):
    ds, full, _g = stream
    mono = str(tmp_path / "mono")
    build_index(spark, full, mono, CFG)
    want_keys = [
        (r.doc_key, round(r.score, 4))
        for r in bm25_topk(spark, mono, "w0 w3", k=10, cfg=CFG, mode="simple", with_keys=True).collect()
    ]
    from mysql_es_spark.plans.data_stream import _complete_generations

    keymap = {}
    for lbl, d in _complete_generations(ds).items():
        for r in spark.read.parquet(f"{d}/forward").select("docid", "doc_key").collect():
            keymap[(lbl, r.docid)] = r.doc_key
    got = [
        (keymap[(r["index"], r.docid)], round(r.score, 4))
        for r in search_stream(spark, ds, "w0 w3", k=10).collect()
    ]
    assert got == want_keys


def test_crashed_append_leaves_stream_readable(spark, stream):
    ds, _full, _g = stream
    import mysql_es_spark.plans.data_stream as dsm

    before = search_stream(spark, ds, "w0", k=3).collect()
    # simulate: a generation dir half-built (no alias swap happened)
    half = dsm._gen_dir(ds, 99)
    os.makedirs(half)
    after = search_stream(spark, ds, "w0", k=3).collect()
    assert [(r["index"], r.docid) for r in after] == [(r["index"], r.docid) for r in before]
    os.rmdir(half)


def test_retention_never_drops_write_index(spark, stream):
    ds, _full, _g = stream
    # far-future cutoff: every non-write generation's newest doc is older
    dropped = expire_generations(spark, ds, "9999-01-01")
    assert dropped and all(not d.endswith("convs-000004") for d in dropped)
    # the stream still answers queries from the surviving write index
    assert search_stream(spark, ds, "w0", k=3).count() >= 0
    # idempotent second pass: nothing left to drop
    assert expire_generations(spark, ds, "9999-01-01") == []


def _stream_hits(spark, ds, query, k=10):
    from mysql_es_spark.plans.data_stream import _complete_generations

    keymap = {}
    for lbl, d in _complete_generations(ds).items():
        for r in spark.read.parquet(f"{d}/forward").select("docid", "doc_key").collect():
            keymap[(lbl, r.docid)] = r.doc_key
    return [
        (keymap[(r["index"], r.docid)], round(r.score, 4))
        for r in search_stream(spark, ds, query, k=k).collect()
    ]


def test_forcemerge_stream_rank_preserving(spark, tmp_path):
    from mysql_es_spark.plans.data_stream import (
        _complete_generations,
        forcemerge_stream,
    )

    ds = str(tmp_path / "m")
    create_data_stream(spark, ds, CFG)
    full = transcripts_df(spark, 700, seed=23)
    convs = sorted(r.conv_id for r in full.select("conv_id").distinct().collect())
    c1, c2 = convs[len(convs) // 3], convs[2 * len(convs) // 3]
    append_batch(spark, ds, full.filter(full.conv_id <= c1))
    append_batch(spark, ds, full.filter((full.conv_id > c1) & (full.conv_id <= c2)))
    append_batch(spark, ds, full.filter(full.conv_id > c2))

    before = _stream_hits(spark, ds, "w0 w3")
    res = forcemerge_stream(spark, ds)
    assert res["merged"] == 3  # empty gen1 + two data gens; write index stays
    after = _stream_hits(spark, ds, "w0 w3")
    assert after == before  # rank + score identical across the merge
    gens = _complete_generations(ds)
    assert len(gens) == 2  # merged + write index
    # second call: nothing left to merge
    assert forcemerge_stream(spark, ds)["merged"] == 0


def test_append_after_forcemerge(spark, tmp_path):
    """Regression: forcemerge creates a generation numbered above the
    current write index; the next append must number past it instead of
    colliding (which wedged ingest permanently)."""
    from mysql_es_spark.plans.data_stream import (
        _complete_generations,
        forcemerge_stream,
    )

    ds = str(tmp_path / "afm")
    create_data_stream(spark, ds, CFG)
    full = transcripts_df(spark, 600, seed=29)
    convs = sorted(r.conv_id for r in full.select("conv_id").distinct().collect())
    c1, c2 = convs[len(convs) // 3], convs[2 * len(convs) // 3]
    append_batch(spark, ds, full.filter(full.conv_id <= c1))
    append_batch(spark, ds, full.filter((full.conv_id > c1) & (full.conv_id <= c2)))
    forcemerge_stream(spark, ds)  # merged gen now outnumbers write index
    g = append_batch(spark, ds, full.filter(full.conv_id > c2))
    labels = sorted(_complete_generations(ds))
    assert os.path.basename(g["generation"]) == labels[-1]
    # every doc searchable exactly once after merge + append
    got = _stream_hits(spark, ds, "w0 w3")
    mono = str(tmp_path / "afm_mono")
    build_index(spark, full, mono, CFG)
    want = [
        (r.doc_key, round(r.score, 4))
        for r in bm25_topk(spark, mono, "w0 w3", k=10, cfg=CFG, mode="simple", with_keys=True).collect()
    ]
    assert got == want


def test_forcemerge_duplicate_policy(spark, tmp_path):
    from mysql_es_spark.plans.data_stream import forcemerge_stream

    ds = str(tmp_path / "dup")
    create_data_stream(spark, ds, CFG)
    batch = transcripts_df(spark, 120, seed=5)
    append_batch(spark, ds, batch)
    append_batch(spark, ds, batch)  # same docs again
    append_batch(spark, ds, transcripts_df(spark, 40, seed=6))  # write ix
    with pytest.raises(ValueError, match="doc_key duplicated"):
        forcemerge_stream(spark, ds)
    res = forcemerge_stream(spark, ds, on_dup="last")
    assert res["merged"] == 3
    assert res["n_docs"] == batch.count()  # each doc exactly once


def test_swallowed_generations_invisible(spark, tmp_path):
    import json

    from mysql_es_spark.plans.data_stream import _complete_generations

    ds = str(tmp_path / "sw")
    create_data_stream(spark, ds, CFG)
    append_batch(spark, ds, transcripts_df(spark, 80, seed=9))
    append_batch(spark, ds, transcripts_df(spark, 80, seed=10))
    gens = _complete_generations(ds)
    victim = sorted(gens)[0]
    newest = sorted(gens)[-1]
    with open(f"{gens[newest]}/_swallowed.json", "w") as f:
        json.dump([victim], f)
    try:
        left = _complete_generations(ds)
        assert victim not in left and newest in left
    finally:
        os.remove(f"{gens[newest]}/_swallowed.json")


def test_merge_positional_indexes_phrase_identical(spark, tmp_path):
    from mysql_es_spark.plans.compact import merge_indexes
    from mysql_es_spark.operators.query import phrase_topk

    cfg = IndexConfig(
        n_buckets=4, wave_size=4, salt_docs=256, term_buckets=8, with_positions=True
    )
    full = transcripts_df(spark, 500, seed=33)
    convs = sorted(r.conv_id for r in full.select("conv_id").distinct().collect())
    cut = convs[len(convs) // 2]
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, full.filter(full.conv_id <= cut), a, cfg)
    build_index(spark, full.filter(full.conv_id > cut), b, cfg)
    mono = str(tmp_path / "mono")
    build_index(spark, full, mono, cfg)
    merged = str(tmp_path / "merged")
    # physical layout may change in the same pass (reshard contract)
    merge_indexes(spark, [a, b], merged, cfg=cfg.with_(term_buckets=4))

    for q in ("w0 w1", "w1 w2"):
        want = [
            (r.doc_key, round(r.score, 6))
            for r in phrase_topk(spark, mono, q, k=10, cfg=cfg, with_keys=True).collect()
        ]
        got = [
            (r.doc_key, round(r.score, 6))
            for r in phrase_topk(spark, merged, q, k=10, with_keys=True).collect()
        ]
        assert got == want, q
    # analyzer mismatch refused
    plain = str(tmp_path / "plain")
    build_index(spark, full.limit(50), plain, IndexConfig(n_buckets=4, wave_size=4, salt_docs=256))
    with pytest.raises(ValueError, match="analyzer"):
        merge_indexes(spark, [a, plain], str(tmp_path / "x"))
