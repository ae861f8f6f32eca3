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


def test_chunk_documents_bruteforce(spark):
    from mysql_es_spark.operators.packing import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(25))),   # 25 toks: 3 chunks @ (10, 8)
        (2, "short text"),                            # 1 chunk
        (3, ""),                                      # none
        (4, None),                                    # none
        (5, " ".join(f"u{i}" for i in range(10))),   # exactly one chunk
        (6, " ".join(f"v{i}" for i in range(11))),   # 2 chunks, tail len 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_idx): (r.start_tok, r.n_tokens, r.chunk_text)
        for r in chunk_documents(df, chunk=10, stride=8).collect()
    }
    want = {}
    for d, text in rows:
        toks = tokenize_text(text)
        if not toks:
            continue
        n_starts = 1 + max(0, -(-(len(toks) - 10) // 8))
        for i in range(n_starts):
            w = toks[i * 8 : i * 8 + 10]
            want[(d, i)] = (i * 8, len(w), " ".join(w))
    assert got == want
    assert got[(1, 2)][1] == 9  # 25 tokens: last window covers 16..24
    assert got[(6, 1)][1] == 3


def test_chunk_documents_overlap_reconstructs(spark):
    from mysql_es_spark.operators.packing import chunk_documents

    text = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        chunk_documents(df, chunk=16, stride=16).collect(), key=lambda r: r.chunk_idx
    )
    # stride == chunk: windows tile the doc exactly
    assert " ".join(c.chunk_text for c in chunks) == text
    with pytest.raises(ValueError):
        chunk_documents(df, chunk=8, stride=9)


def test_greedy_pack_doc_atomic(spark):
    import hashlib

    from mysql_es_spark.operators.packing import greedy_pack

    rows = [(i, "en" if i % 3 else "fr", f"tok " * (5 + (i * 11) % 30)) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = greedy_pack(df, budget=40, part_cols=("lang",), n_shards=4).collect()
    assert len(got) == 80

    def shard(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 4

    # brute-force the greedy recurrence per (lang, shard)
    want = {}
    groups = {}
    for i, lang, text in rows:
        groups.setdefault((lang, shard(i)), []).append((i, len(text.split())))
    for key, docs in groups.items():
        acc = w = 0
        for j, (i, nt) in enumerate(sorted(docs)):
            if j and acc + nt > 40:
                w += 1
                acc = 0
            want[i] = (*key, w, nt)
            acc += nt
    assert {r.doc_id: (r.lang, r.shard, r.window_id, r.n_tokens) for r in got} == want
    # no window exceeds budget unless it is a single oversized doc
    sums = {}
    for r in got:
        sums.setdefault((r.lang, r.shard, r.window_id), []).append(r.n_tokens)
    for members in sums.values():
        assert sum(members) <= 40 or len(members) == 1


def test_greedy_pack_oversized_doc_own_window(spark):
    from mysql_es_spark.operators.packing import greedy_pack

    df = spark.createDataFrame(
        [(1, "a " * 5), (2, "b " * 100), (3, "c " * 5)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.window_id
        for r in greedy_pack(df, budget=20, n_shards=1).collect()
    }
    assert got[2] not in (got[1], got[3])  # the giant is alone
    import pytest as _pytest

    with _pytest.raises(ValueError):
        greedy_pack(df, budget=0)
