"""Fulltext analysis chain — vectorized pandas UDFs.

Re-implements the reference's ES analyzer contract
(/root/reference/etc/template.json:8-52):

- T1 index analyzer  : standard tokenize → lowercase → asciifolding →
                       (optional) front edge-ngram(min..max) → unique
- T2 search analyzer : same chain minus the edge-ngram step

Our concrete, oracle-checkable contract (documented so the DuckDB oracle
can reproduce it exactly):

    fold(text)   = lower(NFKD(text) with combining marks removed)
    tokens(text) = regexp findall '[0-9a-z]+' over fold(text)

which equals DuckDB's ``regexp_extract_all(lower(strip_accents(text)),
'[0-9a-z]+')`` for Latin-script input. Everything is pandas/Arrow
vectorized — no per-row Python UDFs (BASELINE.json input_hint).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_RE = re.compile(r"[0-9a-z]+")
# combining diacritical marks (U+0300..U+036F) stripped after NFKD
_COMBINING_RE = re.compile("[\u0300-\u036f]+")
# DuckDB-oracle equivalent of tokens(): keep in one place
DUCKDB_TOKENIZE = "regexp_extract_all(lower(strip_accents({col})), '[0-9a-z]+')"


def fold_text(s: str) -> str:
    return _COMBINING_RE.sub("", unicodedata.normalize("NFKD", s)).lower()


def tokenize_text(s: str | None) -> list[str]:
    """Scalar tokenizer (search analyzer T2) — used for query strings."""
    if s is None:
        return []
    return TOKEN_RE.findall(fold_text(s))


def edge_ngrams(tokens: list[str], lo: int, hi: int) -> list[str]:
    """Front edge-ngram expansion + unique filter (template.json:30-36).

    Mirrors ES edge_ngram(min_gram=2, max_gram=25) followed by the
    ``unique`` token filter; tokens shorter than ``lo`` pass through
    unchanged (ES emits the original token via the analyzer chain).
    """
    out: list[str] = []
    seen: set[str] = set()
    for t in tokens:
        grams = [t[:n] for n in range(lo, min(len(t), hi) + 1)] if len(t) >= lo else [t]
        for g in grams:
            if g not in seen:
                seen.add(g)
                out.append(g)
    return out


def edge_ngrams_with_positions(
    tokens: list[str], lo: int, hi: int
) -> tuple[list[str], list[int]]:
    """Front edge-ngram expansion keeping source-token positions.

    Lucene's EdgeNGramTokenFilter emits every gram at the position of the
    token it came from, and ES documents that phrase queries over ngram
    fields require the ``unique`` filter to run ``only_on_same_position``
    (the stream-wide variant drops repeat occurrences and silently breaks
    adjacency). Grams of one token are distinct prefixes, so
    only-on-same-position dedup is a no-op — we keep every occurrence.
    Returns (grams, base_token_ordinal) aligned lists; the position of a
    gram is the ordinal of its source token in the analyzed stream, so
    phrase adjacency over the ngram index means "source tokens were
    consecutive", exactly Lucene's behavior (template.json:30-36 analog).
    """
    grams: list[str] = []
    pos: list[int] = []
    for i, t in enumerate(tokens):
        gs = [t[:n] for n in range(lo, min(len(t), hi) + 1)] if len(t) >= lo else [t]
        grams.extend(gs)
        pos.extend([i] * len(gs))
    return grams, pos


def parse_synonym_rules(rules) -> dict[str, tuple[bool, tuple[str, ...]]]:
    """ES synonym-file rule syntax → expansion map.

    Returns ``term -> (keep_original, targets)``:

    - ``"a, b, c"`` (equivalence, expand): each member maps to the other
      members, original kept — Lucene injects them at the same position.
    - ``"a, b => c, d"`` (explicit): every LHS term maps to the RHS terms
      and the original is dropped (Lucene replaces the token).

    Every side is run through the analyzer's fold+tokenize; multi-token
    synonyms (phrases) are out of scope and raise, as does a term that
    appears as the LHS of more than one rule (ES merges them; we keep the
    contract strict so the oracle stays simple)."""
    out: dict[str, tuple[bool, tuple[str, ...]]] = {}

    def one_token(raw: str) -> str:
        toks = tokenize_text(raw)
        if len(toks) != 1:
            raise ValueError(
                f"synonym side {raw!r} must analyze to exactly one token, got {toks}"
            )
        return toks[0]

    for rule in rules:
        if "=>" in rule:
            lhs_raw, rhs_raw = rule.split("=>", 1)
            lhs = [one_token(x) for x in lhs_raw.split(",") if x.strip()]
            rhs = tuple(dict.fromkeys(one_token(x) for x in rhs_raw.split(",") if x.strip()))
            if not lhs or not rhs:
                raise ValueError(f"bad explicit synonym rule {rule!r}")
            for src in lhs:
                if src in out:
                    raise ValueError(f"term {src!r} appears in more than one synonym rule")
                out[src] = (False, tuple(t for t in rhs if t != src) or rhs)
        else:
            members = list(dict.fromkeys(one_token(x) for x in rule.split(",") if x.strip()))
            if len(members) < 2:
                raise ValueError(f"equivalence synonym rule {rule!r} needs >= 2 terms")
            for src in members:
                if src in out:
                    raise ValueError(f"term {src!r} appears in more than one synonym rule")
                out[src] = (True, tuple(m for m in members if m != src))
    return out


def fold_series(s: pd.Series) -> pd.Series:
    """Vectorized fold: NFKD → strip combining marks → lower."""
    filled = s.fillna("")
    return (
        filled.str.normalize("NFKD").str.replace(_COMBINING_RE, "", regex=True).str.lower()
    )


def tokenize_series(
    s: pd.Series,
    edge_ngram: bool = False,
    ngram_min: int = 2,
    ngram_max: int = 25,
) -> pd.Series:
    """Vectorized tokenize: Series[str] → Series[list[str]]."""
    toks = fold_series(s).str.findall(TOKEN_RE)
    if edge_ngram:
        toks = toks.map(lambda ts: edge_ngrams(ts, ngram_min, ngram_max))
    # null text → empty token list (reference serializes null text as an
    # absent field; we index nothing for it)
    return toks.where(s.notna(), other=pd.Series([[]] * len(s), index=s.index))


def tokenize_udf(edge_ngram: bool = False, ngram_min: int = 2, ngram_max: int = 25):
    """pandas UDF: text column → array<string> of analyzer tokens."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return tokenize_series(s, edge_ngram, ngram_min, ngram_max)

    return _tok


def spark_tokens_col(col: str = "text"):
    """Pure-JVM tokenizer expression, exactly equivalent to
    :func:`tokenize_series` for input already free of combining marks
    after NFKD — used by DuckDB-oracle-checked relational queries so both
    sides share one definition. For full unicode folding use the pandas
    UDF (JVM has no NFKD builtin)."""
    return F.expr(
        f"filter(split(lower({col}), '[^0-9a-z]+'), x -> x != '')"
    )


# ---------------------------------------------------------------------------
# stored synonym sets (ES 8.10 _synonyms API)
# ---------------------------------------------------------------------------


def put_synonym_set(spark, index_dir: str, set_id: str, rules: list[str]) -> None:
    """Store (or replace) a named synonym set under this index — ES PUT
    _synonyms/{id}. Rules use the ES synonym-file syntax ("a, b" /
    "a => b"); they are parse-validated at put time so a bad rule fails
    here, not at query time."""
    import os

    from pyspark.sql import functions as F  # noqa: F401

    from ..sources import tables as tbl

    parse_synonym_rules(tuple(rules))  # validate
    existing = list_synonym_sets(spark, index_dir)
    rows = [
        (r.set_id, r.rules) for r in existing.collect() if r.set_id != set_id
    ]
    rows.append((set_id, "\n".join(rules)))
    tbl.local_rows_df(spark, sorted(rows), "set_id string, rules string").coalesce(
        1
    ).write.mode("overwrite").parquet(tbl.p(index_dir, "synonym_sets"))


def list_synonym_sets(spark, index_dir: str):
    import os

    from ..sources import tables as tbl

    d = tbl.p(index_dir, "synonym_sets")
    if not os.path.isdir(d):
        return tbl.local_rows_df(spark, [], "set_id string, rules string")
    return spark.read.parquet(d)


def get_synonym_set(spark, index_dir: str, set_id: str) -> list[str]:
    from pyspark.sql import functions as F

    rows = (
        list_synonym_sets(spark, index_dir)
        .filter(F.col("set_id") == set_id)
        .collect()
    )
    if not rows:
        raise KeyError(f"no synonym set {set_id!r} in this index")
    return rows[0]["rules"].split("\n")


def synonym_set_as_expansions(spark, index_dir: str, set_id: str) -> dict[str, list[str]]:
    """A stored set compiled to the query-time expansion map
    :func:`operators.query.synonym_topk` takes: term → other clause
    members. Query-time synonyms always dis-max the original WITH its
    expansions (the ES search-analyzer expand mode); explicit ``=>``
    rules' replace semantics belong to index time (IndexConfig.synonyms),
    so here their LHS simply expands to the RHS."""
    parsed = parse_synonym_rules(tuple(get_synonym_set(spark, index_dir, set_id)))
    return {term: list(targets) for term, (_keep, targets) in parsed.items()}
