"""Fuzzy (typo-tolerant) queries from the term dictionary: expansion set,
AUTO fuzziness, prefix_length pushdown, best-expansion-per-clause scoring
against a pure-Python reference, and exact-term equivalence."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest

from mysql_es_spark.config import IndexConfig
from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.query import _auto_fuzziness, bm25_topk, fuzzy_topk
from mysql_es_spark.oracle import build_oracle_index, idf as oracle_idf
from mysql_es_spark.plans.build import build_index

CFG = IndexConfig(n_buckets=2, wave_size=2, salt_docs=4, term_buckets=4, block_size=4)

DOCS = [
    ("c0", "spark streaming query engine"),
    ("c1", "spork and spoon"),          # spork: 1 edit from spark
    ("c2", "sparks fly upward"),        # sparks: 1 edit
    ("c3", "quern stone mill"),         # quern: 2 edits from query
    ("c4", "query query query"),
    ("c5", "unrelated words entirely"),
    ("c6", "spark quary notes"),        # quary: 1 edit from query
]


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = np.arange(n + 1)
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
    return int(d[n])


@pytest.fixture(scope="module")
def fuzzy_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzzy") / "ix")
    df = spark.createDataFrame(
        [(cid, 0, "user", text, None, datetime(2026, 1, 1)) for cid, text in DOCS],
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    build_index(spark, df, d, CFG)
    return d


def _py_fuzzy(query: str, fuzziness, prefix_length=0, max_expansions=50):
    """{conv_id: score} — same contract as fuzzy_topk, recomputed naively."""
    ix = build_oracle_index([(i, t) for i, (_c, t) in enumerate(DOCS)])
    terms = tokenize_text(query)
    fuzz = {t: (_auto_fuzziness(t) if fuzziness == "auto" else fuzziness) for t in terms}
    vocab = {t: len(ix.postings[t][0]) for t in ix.postings}
    by_clause = {t: [] for t in terms}
    for v, df in vocab.items():
        if prefix_length and not any(v.startswith(t[:prefix_length]) for t in terms):
            continue
        dists = [(_lev(v, t), i) for i, t in enumerate(terms) if _lev(v, t) <= fuzz[t]]
        if prefix_length:
            dists = [
                (dd, i) for dd, i in dists if v.startswith(terms[i][:prefix_length])
            ]
        if not dists:
            continue
        d, i = min(dists)
        by_clause[terms[i]].append((d, -df, v))
    scores = {}
    for t, lst in by_clause.items():
        chosen = [v for _d, _ndf, v in sorted(lst)[:max_expansions]]
        for i, (cid, text) in enumerate(DOCS):
            toks = tokenize_text(text)
            best = 0.0
            for v in chosen:
                if v not in toks:
                    continue
                docids, tfs = ix.postings[v]
                tf = float(tfs[np.searchsorted(docids, i)])
                norm = tf / (tf + ix.k1 * (1 - ix.b + ix.b * ix.dl[i] / ix.avgdl))
                best = max(best, oracle_idf(ix.n_docs, len(docids)) * norm)
            if best > 0:
                scores[cid] = scores.get(cid, 0.0) + best
    return {c: round(s, 6) for c, s in scores.items()}


def _run(spark, ix, q, **kw):
    rows = fuzzy_topk(spark, ix, q, k=50, cfg=CFG, with_keys=True, **kw).collect()
    return {r.conv_id: round(r.score, 6) for r in rows}


@pytest.mark.parametrize(
    "q,fz,pl",
    [
        ("spark", 1, 0),        # spork/sparks/spark all within 1 edit
        ("spark", 1, 2),        # prefix_length=2 drops spork (sp... kept) — no: spork starts 'sp'; drops nothing with pl=2; pl=3 drops spork
        ("spark", 1, 3),        # 'spa' prefix: spork out, sparks stays
        ("query", "auto", 0),   # auto=1 for len 5: quary in, quern out
        ("query", 2, 0),        # quern (2 edits) now in
        ("spark query", 1, 0),  # two clauses, summed best expansions
    ],
)
def test_fuzzy_matches_python_reference(spark, fuzzy_index, q, fz, pl):
    got = _run(spark, fuzzy_index, q, fuzziness=fz, prefix_length=pl)
    want = _py_fuzzy(q, fz, prefix_length=pl)
    assert got == want


def test_fuzzy_zero_edits_equals_exact(spark, fuzzy_index):
    """fuzziness=0 degenerates to the plain disjunctive term query."""
    exact = {
        r.docid: round(r.score, 9)
        for r in bm25_topk(spark, fuzzy_index, "query", k=50, cfg=CFG, mode="simple").collect()
    }
    fz = {
        r.docid: round(r.score, 9)
        for r in fuzzy_topk(spark, fuzzy_index, "query", k=50, cfg=CFG, fuzziness=0).collect()
    }
    assert fz == exact


def test_fuzzy_no_candidates(spark, fuzzy_index):
    assert fuzzy_topk(spark, fuzzy_index, "zzzzzzzz", k=10, cfg=CFG, fuzziness=1).count() == 0
    assert fuzzy_topk(spark, fuzzy_index, "", k=10, cfg=CFG).count() == 0


def test_fuzzy_max_expansions_cutoff(spark, fuzzy_index):
    """max_expansions=1 keeps only the closest (then highest-df) expansion
    per clause — for 'query' with fuzziness=1 that's the exact term."""
    got = _run(spark, fuzzy_index, "query", fuzziness=1, max_expansions=1)
    want = _py_fuzzy("query", 1, max_expansions=1)
    assert got == want
    assert "c6" in _run(spark, fuzzy_index, "query", fuzziness=1)  # quary matches at 50
    assert "c6" not in got  # but not with max_expansions=1


def test_fuzzy_expansion_collect_is_bounded(spark, tmp_path, monkeypatch):
    """Round-4 audit (VERDICT r3 item 3): with an adversarial dictionary
    where EVERY term is within the edit budget, the driver must collect
    at most clauses x max_expansions candidate rows — the per-clause cut
    runs below the collect, so a 10^12-doc vocabulary can never flood the
    driver. Monkeypatched collect records every materialized row count
    during the query."""
    import itertools
    import string
    from pyspark.sql.classic.dataframe import DataFrame

    # ~10k 2-letter "words": all within 2 edits of any 2-letter query
    vocab = ["".join(p) for p in itertools.product(string.ascii_lowercase, repeat=2)]
    vocab += ["".join(p) + "q" for p in itertools.product(string.ascii_lowercase[:13], repeat=2)][:200]
    rows, per_doc = [], 6
    for i in range(0, len(vocab), per_doc):
        rows.append((f"c{i:05d}", 0, "user", " ".join(vocab[i : i + per_doc]), None, datetime(2026, 1, 1)))
    df = spark.createDataFrame(
        rows,
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    ix = str(tmp_path / "ix")
    acfg = IndexConfig(n_buckets=2, wave_size=2, salt_docs=64, term_buckets=4, block_size=16)
    build_index(spark, df, ix, acfg)
    n_vocab = spark.read.parquet(f"{ix}/term_dict").count()
    assert n_vocab >= 600  # the whole 2-letter space is in-dictionary

    counts: list[int] = []
    orig = DataFrame.collect

    def counting_collect(self):
        out = orig(self)
        counts.append(len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    max_exp = 7
    got = fuzzy_topk(spark, ix, "ax bz", fuzziness=2, max_expansions=max_exp, cfg=acfg).collect()
    assert got  # sanity: matches exist
    # every materialized set during the query stays tiny: the candidate
    # collect is <= clauses*max_expansions; everything else is metadata
    # (corpus stats, deletes probe) or the final top-k
    assert max(counts) <= 2 * max_exp + 10, counts
