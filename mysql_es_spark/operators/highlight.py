"""Search-result highlighting — the ES ``highlight`` block.

The reference's synced indexes serve search UIs that ask ES to wrap query
matches in ``<em>`` tags (the default ES highlighter contract;
/root/reference/etc/template.json's analyzed text fields are exactly the
highlightable ones). Re-expressed engine-side as pure column expressions:

- :func:`highlight_terms` — whole-field highlight (ES
  ``number_of_fragments: 0``): every query term occurrence wrapped in
  ``pre``/``post`` tags, case-insensitive, on word boundaries.
- :func:`highlight_fragment` — one centered snippet of ``size`` chars
  around the first match (ES default fragmenting, simplified to the
  single best-leading fragment).

Both are JVM ``regexp_replace`` / ``substring`` expressions inside
whole-stage codegen — no UDF, no extra pass over the data; they bolt onto
the already-fetched top-k rows, so their cost is O(k), never corpus-
proportional. Matching is ASCII word-boundary case-insensitive (the
engine's analyzer lowercases + strips accents; highlighting, like ES's
plain highlighter, re-matches the stored original — identical for the
ASCII terms the tokenizer emits).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pattern(terms: list[str]) -> str:
    """Alternation of the query terms, word-bounded. Terms are analyzer
    output ([0-9a-z]+), escaped anyway; sorted longest-first so an
    overlapping shorter term never shadows a longer one."""
    alts = sorted({re.escape(t.lower()) for t in terms if t}, key=lambda t: (-len(t), t))
    if not alts:
        raise ValueError("highlight needs at least one term")
    return r"\b(" + "|".join(alts) + r")\b"


def highlight_expr(
    terms: list[str], text_col: str = "text", pre: str = "<em>", post: str = "</em>"
) -> Column:
    """Column expression: ``text_col`` with every term match wrapped."""
    return F.regexp_replace(F.col(text_col), "(?i)" + _pattern(terms), pre + "$1" + post)


def duckdb_highlight_expr(
    terms: list[str], text_col: str = "text", pre: str = "<em>", post: str = "</em>"
) -> str:
    """The DuckDB expression equal to :func:`highlight_expr` (RE2 and
    Java regex agree on ASCII ``\\b`` and alternation; DuckDB's global +
    case-insensitive flags are ``'gi'``, backrefs are ``\\1``)."""
    return (
        f"regexp_replace({text_col}, '{_pattern(terms)}', "
        f"'{pre}\\1{post}', 'gi')"
    )


def highlight_terms(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    out: str = "highlight",
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """Whole-field highlight (ES ``number_of_fragments: 0``)."""
    return df.withColumn(out, highlight_expr(terms, text_col, pre, post))


def highlight_fragment(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    out: str = "highlight",
    size: int = 80,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """One ``size``-char snippet centered on the first match, then
    highlighted; rows with no match get the field head (ES
    ``no_match_size`` behavior). Pure JVM expressions: regexp_instr
    locates, substring cuts, regexp_replace wraps."""
    pat = "(?i)" + _pattern(terms)
    pos = F.regexp_instr(F.col(text_col), F.lit(pat))  # 0 = no match
    start = F.greatest(F.lit(1), pos - int(size // 2))
    frag = F.substring(F.col(text_col), start.cast("int"), size)
    return df.withColumn(out, F.regexp_replace(frag, pat, pre + "$1" + post))
