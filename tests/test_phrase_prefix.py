"""match_phrase_prefix vs a pure-Python oracle.

ES semantics under test: "fixed… pre" matches docs where the fixed tokens
appear as an exact phrase immediately followed by ANY dictionary expansion
of the prefix (df-desc/term-asc cutoff at max_expansions); per-doc score =
exact-phrase BM25 with the expansion as last term, max over expansions.
"""

from __future__ import annotations

import math
import shutil

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.operators.query import phrase_prefix_topk
from mysql_es_spark.oracle import build_oracle_index, idf
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.plans.build import build_index

POS_CFG = IndexConfig(
    n_buckets=4, wave_size=2, salt_docs=256, term_buckets=8, block_size=64,
    with_positions=True,
)


@pytest.fixture(scope="module")
def pos_index(spark, tiny_transcripts, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ppix") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, tiny_transcripts, d, POS_CFG)
    return d


@pytest.fixture(scope="module")
def fwd(spark, pos_index):
    return (
        spark.read.parquet(f"{pos_index}/forward").select("docid", "text").collect()
    )


def _oracle(fwd, phrase, prefix_max, k):
    docs = [(r.docid, r.text) for r in fwd]
    oix = build_oracle_index(docs)
    seq = tokenize_text(phrase)
    fixed, prefix = seq[:-1], seq[-1]
    # expansion set: df desc, term asc, cutoff
    cand = [
        (len(ix_ids), t)
        for t, (ix_ids, _) in oix.postings.items()
        if t.startswith(prefix)
    ]
    cand.sort(key=lambda x: (-x[0], x[1]))
    exps = [t for _, t in cand[:prefix_max]]
    toks_of = {d: tokenize_text(t) for d, t in docs}
    best: dict[int, tuple[float, int]] = {}
    for e in exps:
        full = fixed + [e]
        e_df = len(oix.postings[e][0])
        for d, toks in toks_of.items():
            hits = sum(
                1
                for i in range(len(toks) - len(full) + 1)
                if toks[i : i + len(full)] == full
            )
            if not hits:
                continue
            s = 0.0
            for t in dict.fromkeys(full):
                ids, tfs = oix.postings[t]
                j = int(ids.searchsorted(d))
                tf = float(tfs[j])
                dl = float(oix.dl[d])
                s += idf(oix.n_docs, len(ids)) * tf / (
                    tf + oix.k1 * (1 - oix.b + oix.b * dl / oix.avgdl)
                )
            if d not in best or s > best[d][0]:
                best[d] = (s, hits)
    out = sorted(best.items(), key=lambda x: (-x[1][0], x[0]))[:k]
    return [(d, s, h) for d, (s, h) in out]


@pytest.mark.parametrize("phrase,me", [("w0 w", 8), ("w3 w1", 12), ("w", 5)])
def test_phrase_prefix_matches_oracle(spark, pos_index, fwd, phrase, me):
    want = _oracle(fwd, phrase, me, 12)
    got = phrase_prefix_topk(
        spark, pos_index, phrase, k=12, cfg=POS_CFG, max_expansions=me
    ).collect()
    assert [(r.docid, r.n_hits) for r in got] == [(d, h) for d, _, h in want], phrase
    for r, (_, s, _) in zip(got, want):
        assert math.isclose(r.score, s, abs_tol=1e-9)
    assert want, f"oracle found no matches for {phrase!r} — weak test"


def test_phrase_prefix_empty_and_errors(spark, pos_index):
    assert phrase_prefix_topk(spark, pos_index, "", cfg=POS_CFG).count() == 0
    assert (
        phrase_prefix_topk(spark, pos_index, "w0 zzzzqqq", cfg=POS_CFG).count() == 0
    )


def test_phrase_prefix_needs_positions(spark, built_index):
    from tests.conftest import TEST_CFG

    with pytest.raises(ValueError):
        phrase_prefix_topk(spark, built_index, "w0 w", cfg=TEST_CFG).count()
