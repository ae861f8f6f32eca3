"""ES sparse_vector query (learned-sparse / ELSER-style retrieval): the
query is a token→weight map and score(d) = Σ_t w_t · BM25 tf-saturation —
no idf. Verified against a pure-Python reference on the same corpus, plus
path identity (simple == pruned == distributed), analyzer normalization
of query tokens, weight-collision summing, and non-positive-weight
pruning."""

from __future__ import annotations

from datetime import datetime

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import bm25_topk, sparse_vector_topk
from mysql_es_spark.plans.build import build_index

CFG = IndexConfig(n_buckets=2, wave_size=2, salt_docs=4, term_buckets=4, block_size=4)

DOCS = [
    ("c0", "spark join query engine"),
    ("c1", "spark query window"),
    ("c2", "spark batch pipeline"),
    ("c3", "join window agg"),
    ("c4", "spark join window batch"),
    ("c5", "unrelated words entirely"),
    ("c6", "spark spark spark join"),
    ("c7", ""),
]


@pytest.fixture(scope="module")
def sv_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sparsev") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, CFG)
    fwd = spark.read.parquet(f"{d}/forward").select("docid", "conv_id").collect()
    return d, {r.docid: r.conv_id for r in fwd}


def _py_sparse(weights: dict[str, float]) -> dict[str, float]:
    """Reference scores {conv_id: score} straight from the corpus text."""
    toks = {cid: tokenize_text(text) for cid, text in DOCS}
    avgdl = sum(len(t) for t in toks.values()) / len(toks)
    k1, b = CFG.k1, CFG.b
    out: dict[str, float] = {}
    for cid, tl in toks.items():
        s = 0.0
        for term, w in weights.items():
            tf = tl.count(term)
            if tf:
                s += w * tf / (tf + k1 * (1 - b + b * len(tl) / avgdl))
        if s > 0:
            out[cid] = s
    return out


def _got(spark, ix, docmap, weights, **kw):
    rows = sparse_vector_topk(spark, ix, weights, k=10, cfg=CFG, **kw).collect()
    return [(docmap[r.docid], r.score) for r in rows]


def _exp(docmap, weights):
    """Expected (conv_id, score) in engine order: (score desc, docid asc)."""
    did = {cid: d for d, cid in docmap.items()}
    return sorted(_py_sparse(weights).items(), key=lambda t: (-t[1], did[t[0]]))


def test_matches_python_reference(spark, sv_index):
    ix, docmap = sv_index
    w = {"spark": 2.0, "window": 0.5, "agg": 1.5}
    exp = _exp(docmap, w)
    got = _got(spark, ix, docmap, w)
    assert [c for c, _ in got] == [c for c, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, abs=1e-9)


def test_weights_not_idf(spark, sv_index):
    """A rare term with a low weight must NOT outrank a common term with a
    high weight — i.e. idf plays no role."""
    ix, docmap = sv_index
    got = _got(spark, ix, docmap, {"spark": 5.0, "agg": 0.1})
    # c6 has tf(spark)=3 → highest saturation on the heavy term
    assert got[0][0] == "c6"
    # idf-scored BM25 would rank agg-bearing c3 near the top; here it's last
    assert [c for c, _ in got].index("c3") == len(got) - 1


def test_pruned_and_distributed_identical(spark, sv_index):
    ix, docmap = sv_index
    w = {"spark": 1.0, "join": 2.0, "batch": 0.7}
    simple = _got(spark, ix, docmap, w, mode="simple")
    pruned = _got(spark, ix, docmap, w, mode="pruned")
    assert simple == pruned
    forced = CFG.with_(max_driver_salts=0)
    dist = [
        (docmap[r.docid], r.score)
        for r in sparse_vector_topk(spark, ix, w, k=10, cfg=forced, mode="pruned").collect()
    ]
    assert simple == dist


def test_normalization_collision_and_pruning(spark, sv_index):
    ix, docmap = sv_index
    # "Spark!" and "spark" normalize to the same term → weights sum;
    # zero/negative weights are pruned; unknown terms contribute nothing
    got = _got(spark, ix, docmap, {"Spark!": 1.5, "spark": 0.5, "window": -3.0, "zzz": 4.0})
    exp = _exp(docmap, {"spark": 2.0})
    assert [c for c, _ in got] == [c for c, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, abs=1e-9)


def test_empty_after_pruning(spark, sv_index):
    ix, _ = sv_index
    assert sparse_vector_topk(spark, ix, {"spark": -1.0}, cfg=CFG).count() == 0


def test_min_score_floor(spark, sv_index):
    ix, docmap = sv_index
    w = {"spark": 2.0, "join": 1.0}
    full = _got(spark, ix, docmap, w)
    floor = (full[1][1] + full[2][1]) / 2
    got = _got(spark, ix, docmap, w, min_score=floor)
    assert got == [r for r in full if r[1] >= floor]


def test_uniform_weights_equal_idf_free_bm25(spark, sv_index):
    """weights==idf reproduces bm25_topk exactly (drop-in property)."""
    ix, _ = sv_index
    from mysql_es_spark.operators.query import corpus_stats, term_idfs

    stats = corpus_stats(spark, ix)
    idf = term_idfs(spark, ix, ["spark", "join"], stats["n_docs"])
    via_sv = sparse_vector_topk(spark, ix, idf, k=10, cfg=CFG).collect()
    via_bm = bm25_topk(spark, ix, "spark join", k=10, cfg=CFG).collect()
    assert [(r.docid, r.score) for r in via_sv] == [(r.docid, r.score) for r in via_bm]
