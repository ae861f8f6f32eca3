"""Index-time synonyms (ES synonym token filter): equivalence classes
injected at the same position (posincr 0, dl-discounted), explicit rules
replacing tokens, phrase behavior over injected positions, meta roundtrip."""

from __future__ import annotations

import math
import shutil

import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.corpus import transcripts_df
from mysql_es_spark.functions.analyze import parse_synonym_rules, tokenize_text
from mysql_es_spark.operators.query import (
    bm25_topk,
    effective_config,
    index_mapping,
    phrase_topk,
)
from mysql_es_spark.plans.build import build_index

BASE = dict(n_buckets=4, wave_size=2, salt_docs=256, term_buckets=8, block_size=64)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, 400, seed=23)


@pytest.fixture(scope="module")
def syn_index(spark, corpus, tmp_path_factory):
    cfg = IndexConfig(**BASE, synonyms=("w0, w1",))
    d = str(tmp_path_factory.mktemp("synix") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, corpus, d, cfg)
    return d, cfg


@pytest.fixture(scope="module")
def docs(spark, syn_index):
    d, _cfg = syn_index
    rows = spark.read.parquet(f"{d}/forward").select("docid", "text").collect()
    return {r.docid: tokenize_text(r.text) for r in rows}


def _oracle_scores(docs, clazz, k1=1.2, b=0.75):
    """BM25 where the whole synonym class acts as one merged term and dl
    counts only the original tokens (Lucene discountOverlaps)."""
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    tfs = {d: sum(1 for t in toks if t in clazz) for d, toks in docs.items()}
    df = sum(1 for v in tfs.values() if v)
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    out = {}
    for d, tf in tfs.items():
        if not tf:
            continue
        dl = len(docs[d])
        out[d] = idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))
    return out


def test_parse_synonym_rules():
    m = parse_synonym_rules(("Car, AUTO", "tv => television"))
    assert m["car"] == (True, ("auto",))
    assert m["auto"] == (True, ("car",))
    assert m["tv"] == (False, ("television",))
    with pytest.raises(ValueError):
        parse_synonym_rules(("big apple => nyc",))  # multi-token side
    with pytest.raises(ValueError):
        parse_synonym_rules(("a, b", "a => c"))  # duplicate LHS
    with pytest.raises(ValueError):
        parse_synonym_rules(("solo",))  # 1-member equivalence


def test_equivalence_scores_match_merged_class_oracle(spark, syn_index, docs):
    d, cfg = syn_index
    clazz = {"w0", "w1"}
    want = _oracle_scores(docs, clazz)
    for q in ("w0", "w1"):
        got = {
            r.docid: r.score
            for r in bm25_topk(spark, d, q, k=len(docs), cfg=cfg, mode="simple").collect()
        }
        assert set(got) == set(want)
        for doc, s in got.items():
            assert abs(s - want[doc]) < 1e-9, (q, doc)
    # pruned mode identical on a synonym index
    simple = [(r.docid, round(r.score, 9)) for r in bm25_topk(spark, d, "w1", k=10, cfg=cfg, mode="simple").collect()]
    pruned = [(r.docid, round(r.score, 9)) for r in bm25_topk(spark, d, "w1", k=10, cfg=cfg, mode="pruned").collect()]
    assert simple == pruned


def test_dl_not_inflated_by_injection(spark, corpus, syn_index, tmp_path_factory):
    d, _cfg = syn_index
    plain_cfg = IndexConfig(**BASE)
    p = str(tmp_path_factory.mktemp("plainix") / "ix")
    shutil.rmtree(p, ignore_errors=True)
    build_index(spark, corpus, p, plain_cfg)
    syn_dl = {r.docid: r.dl for r in spark.read.parquet(f"{d}/doc_lens").collect()}
    plain_dl = {r.docid: r.dl for r in spark.read.parquet(f"{p}/doc_lens").collect()}
    assert syn_dl == plain_dl


def test_explicit_rule_replaces(spark, corpus, tmp_path_factory, docs):
    cfg = IndexConfig(**BASE, synonyms=("w2 => w9",))
    d = str(tmp_path_factory.mktemp("replix") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, corpus, d, cfg)
    # the LHS term is gone from the index
    assert bm25_topk(spark, d, "w2", k=5, cfg=cfg, mode="simple").count() == 0
    # the RHS matches every doc that had either term
    got = {r.docid for r in bm25_topk(spark, d, "w9", k=10**6, cfg=cfg, mode="simple").collect()}
    want = {doc for doc, toks in docs.items() if {"w2", "w9"} & set(toks)}
    assert got == want


def test_phrase_over_injected_positions(spark, corpus, tmp_path_factory, docs):
    cfg = IndexConfig(**BASE, synonyms=("w0, w1",), with_positions=True)
    d = str(tmp_path_factory.mktemp("synpos") / "ix")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, corpus, d, cfg)
    got = {r.docid for r in phrase_topk(spark, d, "w1 w3", k=10**6, cfg=cfg).collect()}
    want = {
        doc
        for doc, toks in docs.items()
        if any(toks[i] in ("w0", "w1") and toks[i + 1] == "w3" for i in range(len(toks) - 1))
    }
    assert got == want and want  # non-trivial on this corpus


def test_meta_roundtrip_and_guards(spark, syn_index):
    d, cfg = syn_index
    eff = effective_config(spark, d, None)
    assert eff.synonyms == ("w0, w1",)
    assert index_mapping(spark, d)["analyzer"]["synonyms"] == ["w0, w1"]
    with pytest.raises(ValueError):
        from mysql_es_spark.operators.postings import tokenized

        tokenized(None, IndexConfig(synonyms=("a, b",), edge_ngram=True))
