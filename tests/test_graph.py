"""Graph _explore: waves, exclusion, co-occurrence — vs a Python oracle."""

from __future__ import annotations

import pytest

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.graph import graph_explore


@pytest.fixture(scope="module")
def corpus(spark, built_index):
    rows = spark.read.parquet(f"{built_index}/forward").select("docid", "text").collect()
    return {r.docid: set(tokenize_text(r.text)) for r in rows}


def _sig_terms(corpus, query_terms, size, min_doc_count, exclude=()):
    matched = [d for d, toks in corpus.items() if toks & set(query_terms)]
    n_fg, n_bg = len(matched), len(corpus)
    fg = {}
    for d in matched:
        for t in corpus[d]:
            fg[t] = fg.get(t, 0) + 1
    bg = {}
    for toks in corpus.values():
        for t in toks:
            bg[t] = bg.get(t, 0) + 1
    out = []
    for t, f in fg.items():
        if f < min_doc_count:
            continue
        fgp, bgp = f / n_fg, bg[t] / n_bg
        if fgp > bgp:
            out.append((t, round((fgp - bgp) * (fgp / bgp), 9)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return [t for t, _ in out if t not in exclude][:size]


def test_wave0_matches_significant_terms_oracle(spark, built_index, corpus):
    verts, conns = graph_explore(
        spark, built_index, "w0 w3", depth=0, top_vertices=5, min_doc_count=2
    )
    got = [r.term for r in verts.orderBy("jlh", ascending=False).collect()]
    want = _sig_terms(corpus, ["w0", "w3"], 5, 2)
    assert got == want
    assert conns.count() == 0  # depth 0: no spidering, no edges


def test_depth1_excludes_seen_and_counts_cooccurrence(spark, built_index, corpus):
    verts, conns = graph_explore(
        spark, built_index, "w0 w3", depth=1, top_vertices=4, min_doc_count=2
    )
    v = verts.collect()
    wave0 = [r.term for r in v if r.depth == 0]
    wave1 = [r.term for r in v if r.depth == 1]
    assert wave0 == _sig_terms(corpus, ["w0", "w3"], 4, 2)
    assert wave1 == _sig_terms(corpus, wave0, 4, 2, exclude=set(wave0))
    assert not set(wave0) & set(wave1)  # spider never echoes

    got = {(r.source, r.target): r.doc_count for r in conns.collect()}
    for (s, t), n in got.items():
        assert s in wave0 and t in wave1
        want = sum(1 for toks in corpus.values() if s in toks and t in toks)
        assert n == want, (s, t)
    # every co-occurring (wave0, wave1) pair is present
    for s in wave0:
        for t in wave1:
            if s != t and any(s in k and t in k for k in corpus.values()):
                assert (s, t) in got


def test_bad_args(spark, built_index):
    with pytest.raises(ValueError):
        graph_explore(spark, built_index, "w0", depth=-1)
    with pytest.raises(ValueError):
        graph_explore(spark, built_index, "w0", top_vertices=0)
