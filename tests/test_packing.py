from __future__ import annotations

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.packing import pack_sequences

DOCS = [(i, f"word{i} " * (3 + (i * 7) % 40)) for i in range(60)]
BUDGET, SHARDS, SEP = 32, 4, 1


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, schema="doc_id long, text string")


def expected_layout():
    """Brute-force concat-and-chunk per shard in plain Python."""
    import hashlib

    def shard(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % SHARDS

    out = {}
    streams: dict[int, int] = {}
    for i, text in DOCS:  # doc_id ascending == pack order
        s = shard(i)
        cum = streams.get(s, 0)
        n = len(tokenize_text(text))
        out[i] = (n, s, cum // BUDGET, cum % BUDGET)
        streams[s] = cum + n + SEP
    return out


def test_pack_layout_matches_bruteforce(spark, docs_df):
    got = {
        r.doc_id: (r.n_tokens, r.shard, r.pack_id, r.pack_offset)
        for r in pack_sequences(
            docs_df, budget=BUDGET, n_shards=SHARDS, sep_tokens=SEP
        ).collect()
    }
    assert got == expected_layout()


def test_pack_invariant_under_partitioning(spark, docs_df):
    base = pack_sequences(docs_df, budget=BUDGET, n_shards=SHARDS).collect()
    shuffled = pack_sequences(
        docs_df.repartition(7, "text"), budget=BUDGET, n_shards=SHARDS
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, shuffled))


def test_pack_offsets_bounded_and_monotone(spark, docs_df):
    rows = pack_sequences(docs_df, budget=BUDGET, n_shards=SHARDS).collect()
    per_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.pack_offset < BUDGET
        per_shard.setdefault(r.shard, []).append(r)
    for rs in per_shard.values():
        rs.sort(key=lambda r: r.doc_id)
        assert (rs[0].pack_id, rs[0].pack_offset) == (0, 0)  # stream starts at 0
        packs = [r.pack_id for r in rs]
        assert packs == sorted(packs)  # chunk ids never go backwards


def test_pack_bad_budget_raises(spark, docs_df):
    with pytest.raises(ValueError):
        pack_sequences(docs_df, budget=0)
