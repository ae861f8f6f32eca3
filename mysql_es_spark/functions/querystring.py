"""ES ``query_string`` mini-language — parser + AST.

Grammar (the ES/Lucene query-string subset that applies to one analyzed
text field; field prefixes / fuzz suffixes route to the dedicated
operators instead):

    expr    := orExpr
    orExpr  := andExpr (OR andExpr)*
    andExpr := unary ((AND)? unary)*          # bare juxtaposition = AND*
    unary   := '-' unary | NOT unary | '(' expr ')' | TERM

(*) ES's default operator for juxtaposed terms is OR; this engine follows
the stricter Lucene classic default only when ``default_and=True`` —
callers pick, and the driver-checked entry uses explicit operators so the
choice never matters there. Terms are run through the search analyzer; a
term that analyzes to nothing is dropped (ES does the same); a term that
analyzes to several tokens contributes them as one sub-clause joined by
the default operator.

AST nodes: ("term", t) | ("and", [..]) | ("or", [..]) | ("not", node).
"""

from __future__ import annotations

import re

from .analyze import tokenize_text

_TOKEN_RE = re.compile(r"\(|\)|\-|\bAND\b|\bOR\b|\bNOT\b|[^\s()\-]+")


class QueryStringError(ValueError):
    pass


def _lex(qs: str) -> list[str]:
    return _TOKEN_RE.findall(qs)


def parse_query_string(qs: str, default_and: bool = False):
    """Parse to an AST; raises QueryStringError on malformed input or
    when every branch is negative (ES would need match_all — route such
    queries through bm25_bool_topk's pure filter context instead)."""
    toks = _lex(qs)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def eat(t=None):
        nonlocal pos
        cur = peek()
        if cur is None or (t is not None and cur != t):
            raise QueryStringError(f"unexpected token {cur!r} at {pos}")
        pos += 1
        return cur

    def parse_or():
        parts = [parse_and()]
        while peek() == "OR":
            eat("OR")
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def parse_and():
        parts = [parse_unary()]
        connectors: list[str] = []
        while peek() is not None and peek() not in (")", "OR"):
            if peek() == "AND":
                eat("AND")
                connectors.append("and")
                parts.append(parse_unary())
            else:
                nxt = parse_unary()
                # a juxtaposed prohibited clause ("a -d") is Lucene's
                # classic syntax for AND NOT — never an OR alternative
                connectors.append("and" if nxt[0] == "not" else "juxt")
                parts.append(nxt)
        if len(parts) == 1:
            return parts[0]
        kinds = set(connectors)
        if kinds <= {"and"} or default_and:
            return ("and", parts)
        if "and" in kinds:
            # positive-term juxtaposition mixed with explicit AND under
            # default-OR is ambiguous in Lucene classic: group the AND/NOT
            # pairs left-associatively, then OR the juxtaposed rest —
            # unless every connector is juxt (pure OR). Demand parens.
            raise QueryStringError(
                "mixing explicit AND with juxtaposed terms is ambiguous — "
                "add parentheses"
            )
        return ("or_juxt", parts)

    def parse_unary():
        cur = peek()
        if cur in ("-", "NOT"):
            eat()
            return ("not", parse_unary())
        if cur == "(":
            eat("(")
            node = parse_or()
            eat(")")
            return node
        if cur in (")", "OR", "AND", None):
            raise QueryStringError(f"unexpected token {cur!r}")
        word = eat()
        terms = tokenize_text(word)
        if not terms:
            return ("true",)  # analyzes to nothing: neutral clause
        if len(terms) == 1:
            return ("term", terms[0])
        joined = [("term", t) for t in terms]
        return ("and", joined) if default_and else ("or", joined)

    ast = parse_or()
    if pos != len(toks):
        raise QueryStringError(f"trailing tokens at {pos}: {toks[pos:]}")
    ast = _normalize(ast, default_and)
    if _satisfiable_by_empty(ast):
        raise QueryStringError(
            "query is satisfiable by a doc matching no term (pure-negative); "
            "use bm25_bool_topk(must_not=...) for filter-context exclusion"
        )
    return ast


def _normalize(node, default_and: bool):
    """Resolve juxtaposition nodes and fold neutral ('true') clauses."""
    kind = node[0]
    if kind in ("term", "true"):
        return node
    if kind == "not":
        return ("not", _normalize(node[1], default_and))
    parts = [_normalize(p, default_and) for p in node[1]]
    if kind == "or_juxt":
        kind = "and" if default_and else "or"
    parts = [p for p in parts if p != ("true",)] or [("true",)]
    if len(parts) == 1:
        return parts[0]
    return (kind, parts)


def _satisfiable_by_empty(node) -> bool:
    """Would a doc containing none of the query's terms match?"""
    kind = node[0]
    if kind == "term":
        return False
    if kind == "true":
        return True
    if kind == "not":
        return not _satisfiable_by_empty(node[1])
    vals = [_satisfiable_by_empty(p) for p in node[1]]
    return all(vals) if kind == "and" else any(vals)


def ast_terms(node) -> tuple[set[str], set[str]]:
    """(positive, negative) term sets: a term is positive when it appears
    under an even number of NOTs somewhere — only positive occurrences
    contribute to the BM25 score (ES prohibited clauses never score)."""
    pos: set[str] = set()
    neg: set[str] = set()

    def walk(n, flipped: bool):
        kind = n[0]
        if kind == "term":
            (neg if flipped else pos).add(n[1])
        elif kind == "not":
            walk(n[1], not flipped)
        elif kind in ("and", "or"):
            for p in n[1]:
                walk(p, flipped)

    walk(node, False)
    return pos, neg


def ast_to_column(node, contains):
    """Compile the AST to a boolean expression via ``contains(term) ->
    Column`` (works for pyspark Columns and for plain bools in tests)."""
    kind = node[0]
    if kind == "term":
        return contains(node[1])
    if kind == "true":
        raise QueryStringError("unexpected neutral clause after normalize")
    if kind == "not":
        return ~ast_to_column(node[1], contains)
    cols = [ast_to_column(p, contains) for p in node[1]]
    out = cols[0]
    for c in cols[1:]:
        out = (out & c) if kind == "and" else (out | c)
    return out


def ast_to_sql(node, contains_sql) -> str:
    """The DuckDB-oracle equivalent of :func:`ast_to_column`."""
    kind = node[0]
    if kind == "term":
        return contains_sql(node[1])
    if kind == "not":
        return f"(NOT {ast_to_sql(node[1], contains_sql)})"
    op = " AND " if kind == "and" else " OR "
    return "(" + op.join(ast_to_sql(p, contains_sql) for p in node[1]) + ")"
