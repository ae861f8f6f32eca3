"""Pure-NumPy reference BM25 scorer — the rank-identity oracle.

Implements exactly the scoring contract the reference inherits from ES 6.x
(Lucene BM25 defaults; /root/reference/etc/template.json overrides no
``similarity`` key), per SURVEY.md §2.9 T5:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm     = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(d, q) = Σ_{t ∈ q}  idf(t) * tf_norm(t, d)

with k1=1.2, b=0.75, float64 throughout, tie-break (score desc, docid asc).
``N`` counts *all* documents (including zero-token ones); ``avgdl`` is the
mean token count over all documents. The engine (operators/query.py) and
the DuckDB oracle SQL (__spark_entry__.py) must match this rank-identically.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

import numpy as np

from .functions.analyze import tokenize_text


@dataclass
class OracleIndex:
    # postings[term] -> (docids int64 asc, tfs int64)
    postings: dict[str, tuple[np.ndarray, np.ndarray]]
    dl: dict[int, int]
    n_docs: int
    avgdl: float
    k1: float = 1.2
    b: float = 0.75


def build_oracle_index(
    docs: list[tuple[int, str | None]], k1: float = 1.2, b: float = 0.75
) -> OracleIndex:
    """docs: list of (docid, text). Tokenization = engine analyzer (T2)."""
    postings: dict[str, list[tuple[int, int]]] = {}
    dl: dict[int, int] = {}
    for docid, text in docs:
        toks = tokenize_text(text)
        dl[docid] = len(toks)
        for term, tf in Counter(toks).items():
            postings.setdefault(term, []).append((docid, tf))
    packed = {}
    for term, plist in postings.items():
        plist.sort()
        ids = np.array([p[0] for p in plist], dtype=np.int64)
        tfs = np.array([p[1] for p in plist], dtype=np.int64)
        packed[term] = (ids, tfs)
    n = len(dl)
    avgdl = float(sum(dl.values())) / n if n else 0.0
    return OracleIndex(packed, dl, n, avgdl, k1, b)


def idf(n_docs: int, df: int) -> float:
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def score_query(ix: OracleIndex, query: str, k: int) -> list[tuple[int, float]]:
    """Top-k (docid, score), tie-break (score desc, docid asc).

    Terms are deduplicated (the reference's search analyzer ends in the
    ``unique`` filter, /root/reference/etc/template.json:20-28)."""
    terms = list(dict.fromkeys(tokenize_text(query)))
    acc: dict[int, float] = {}
    for t in terms:
        if t not in ix.postings:
            continue
        ids, tfs = ix.postings[t]
        w = idf(ix.n_docs, len(ids))
        dls = np.array([ix.dl[int(d)] for d in ids], dtype=np.float64)
        norm = tfs / (tfs + ix.k1 * (1.0 - ix.b + ix.b * dls / ix.avgdl))
        contrib = w * norm
        for d, c in zip(ids.tolist(), contrib.tolist()):
            acc[d] = acc.get(d, 0.0) + c
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
