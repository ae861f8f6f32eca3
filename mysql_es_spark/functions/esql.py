"""ES|QL subset compiler — ES's piped query language, Spark-first.

ES|QL (``FROM index | WHERE … | STATS … BY … | SORT … | LIMIT …``) is
the query language ES now ships alongside the JSON DSL; the reference's
users run it over the same synced indices. Here each pipe command
compiles to the equivalent DataFrame transformation, so the whole pipe
is ONE Catalyst plan: filters push down to the parquet scan, STATS
becomes a partial+final hash aggregate, SORT+LIMIT collapses to a
TakeOrdered — nothing is interpreted row-by-row and nothing
materializes between pipes.

Supported commands (the documented stable core):

  FROM t1[, t2 …]        source tables (multiple → unionByName, missing
                         columns null-padded, as ES|QL multi-index FROM)
  ROW a = 1, b = "x"     literal one-row source (needs ``spark=``)
  WHERE <expr>           filter (validated pure per-row expression)
  EVAL a = <expr>, …     computed columns, sequential (later items may
                         reference earlier ones, as in ES|QL)
  STATS a = AGG(x), … [BY k1, k2 = <expr>, …]   grouped aggregation
  SORT x [ASC|DESC] [NULLS FIRST|LAST], …       ES|QL null default:
                         nulls sort as larger-than-any-value
  LIMIT n
  KEEP c1, pat*, …       project + reorder (wildcards, first-match-wins)
  DROP c1, pat*, …       remove columns (wildcards)
  RENAME old AS new, …
  MV_EXPAND col          explode a multivalue column (null → null row)

Scalar expressions are Spark SQL expressions — ES|QL's function surface
(ABS, ROUND, CONCAT, LENGTH, SUBSTRING, DATE_TRUNC, CASE, LIKE, IN …)
overlaps Spark's almost everywhere, and double-quoted string literals
parse identically. Every scalar expression passes the same purity
validation as runtime fields (functions/runtime.py): nondeterministic
functions and subqueries are rejected at compile time, so an ES|QL pipe
can never smuggle in cardinality changes or side effects.

Out of scope (documented): DISSECT/GROK (regexp_extract via EVAL covers
the need), ENRICH (the withs relation planner is the join surface), and
metadata fields.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .runtime import _FORBIDDEN, _SUBQUERY

# aggregate surface: ES|QL name -> Spark SQL template ({a} = raw args)
_AGGS = {
    "COUNT": "count({a})",
    "COUNT_DISTINCT": "count(DISTINCT {a})",
    "SUM": "sum({a})",
    "AVG": "avg({a})",
    "MIN": "min({a})",
    "MAX": "max({a})",
    "MEDIAN": "median({a})",
    "PERCENTILE": "percentile({a})",
    # ES|QL VALUES is an unordered multivalue; sorted here so results
    # are deterministic under any partitioning
    "VALUES": "sort_array(collect_list({a}))",
}

_NAME = r"[A-Za-z_][A-Za-z0-9_.]*"


class EsqlError(ValueError):
    pass


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` at paren/bracket depth 0, outside string literals."""
    parts, buf, depth, quote = [], [], 0, None
    i = 0
    while i < len(s):
        ch = s[i]
        if quote:
            buf.append(ch)
            if ch == "\\" and i + 1 < len(s):
                buf.append(s[i + 1])
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts


def _check_scalar(expr: str, what: str) -> str:
    expr = expr.strip()
    if not expr:
        raise EsqlError(f"empty expression in {what}")
    if _FORBIDDEN.search(expr):
        raise EsqlError(f"{what}: nondeterministic/side-effect function in {expr!r}")
    if _SUBQUERY.search(expr):
        raise EsqlError(f"{what}: subqueries are not allowed in {expr!r}")
    return expr


def _expand_patterns(pats: list[str], columns: list[str], what: str) -> list[str]:
    out: list[str] = []
    for p in pats:
        p = p.strip()
        if "*" in p:
            rx = re.compile("^" + re.escape(p).replace(r"\*", ".*") + "$")
            hits = [c for c in columns if rx.match(c)]
            if not hits:
                raise EsqlError(f"{what}: pattern {p!r} matches no column")
            out.extend(h for h in hits if h not in out)
        else:
            if p not in columns:
                raise EsqlError(f"{what}: unknown column {p!r}")
            if p not in out:
                out.append(p)
    return out


def _parse_assignments(body: str, what: str) -> list[tuple[str, str]]:
    """``a = expr, b = expr`` → [(a, expr), …]; bare exprs get themselves
    as their name (ES|QL's implicit naming)."""
    items = []
    for part in _split_top(body, ","):
        part = part.strip()
        if not part:
            raise EsqlError(f"{what}: empty item")
        m = re.match(rf"^({_NAME})\s*=(?!=)\s*(.+)$", part, re.S)
        if m:
            items.append((m.group(1), _check_scalar(m.group(2), what)))
        else:
            items.append((part, _check_scalar(part, what)))
    return items


def _agg_column(alias: str, expr: str) -> Column:
    m = re.match(r"^(\w+)\s*\((.*)\)\s*$", expr.strip(), re.S)
    if not m:
        raise EsqlError(f"STATS: {expr!r} must be a single aggregate call")
    fn, args = m.group(1).upper(), m.group(2).strip()
    if fn not in _AGGS:
        raise EsqlError(
            f"STATS: unsupported aggregate {fn!r} (supported: {sorted(_AGGS)})"
        )
    if fn == "COUNT" and (args == "*" or args == ""):
        args = "*"
    else:
        _check_scalar(args, "STATS")
    return F.expr(_AGGS[fn].format(a=args)).alias(alias)


def _sort_column(item: str) -> Column:
    toks = item.strip()
    m = re.match(
        r"^(.*?)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?\s*$",
        toks,
        re.I | re.S,
    )
    expr, direction, nulls = m.group(1), m.group(2), m.group(3)
    col = F.expr(_check_scalar(expr, "SORT"))
    desc = bool(direction) and direction.upper() == "DESC"
    # ES|QL default: nulls are larger than any value → last on ASC,
    # first on DESC
    if nulls is None:
        nulls = "FIRST" if desc else "LAST"
    if desc:
        return col.desc_nulls_first() if nulls.upper() == "FIRST" else col.desc_nulls_last()
    return col.asc_nulls_first() if nulls.upper() == "FIRST" else col.asc_nulls_last()


def esql(
    query: str,
    tables: dict[str, DataFrame] | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Compile an ES|QL pipe into one DataFrame plan.

    ``tables`` maps FROM names to DataFrames (pass an index's forward
    table to query an index; any DataFrame works). ``spark`` is only
    needed for the ``ROW`` literal source."""
    tables = tables or {}
    pipes = [p.strip() for p in _split_top(query, "|")]
    if not pipes or not pipes[0]:
        raise EsqlError("empty query")
    df: DataFrame | None = None
    for i, cmd in enumerate(pipes):
        m = re.match(r"^(\w+)\s*(.*)$", cmd, re.S)
        if not m:
            raise EsqlError(f"cannot parse command {cmd!r}")
        kw, body = m.group(1).upper(), m.group(2).strip()
        if i == 0:
            if kw == "FROM":
                names = [n.strip() for n in _split_top(body, ",")]
                missing = [n for n in names if n not in tables]
                if missing:
                    raise EsqlError(f"FROM: unknown table(s) {missing}")
                df = tables[names[0]]
                for n in names[1:]:
                    df = df.unionByName(tables[n], allowMissingColumns=True)
            elif kw == "ROW":
                if spark is None:
                    raise EsqlError("ROW needs spark=")
                sel = ", ".join(
                    f"{_check_scalar(e, 'ROW')} AS {a}"
                    for a, e in _parse_assignments(body, "ROW")
                )
                df = spark.sql(f"SELECT {sel}")
            else:
                raise EsqlError(f"query must start with FROM or ROW, got {kw}")
            continue
        assert df is not None
        if kw == "WHERE":
            df = df.filter(F.expr(_check_scalar(body, "WHERE")))
        elif kw == "EVAL":
            for a, e in _parse_assignments(body, "EVAL"):
                df = df.withColumn(a, F.expr(e))  # sequential: later sees earlier
        elif kw == "STATS":
            mby = re.split(r"(?i)\bBY\b", body, maxsplit=1)
            aggs = [
                _agg_column(a, e) for a, e in _parse_assignments(mby[0], "STATS")
            ]
            if len(mby) == 2:
                keys = _parse_assignments(mby[1], "STATS BY")
                for a, e in keys:
                    if a != e:
                        df = df.withColumn(a, F.expr(e))
                df = df.groupBy(*[a for a, _ in keys]).agg(*aggs)
            else:
                df = df.agg(*aggs)
        elif kw == "SORT":
            df = df.orderBy(*[_sort_column(it) for it in _split_top(body, ",")])
        elif kw == "LIMIT":
            if not re.match(r"^\d+$", body):
                raise EsqlError(f"LIMIT needs an integer, got {body!r}")
            df = df.limit(int(body))
        elif kw == "KEEP":
            cols = _expand_patterns(_split_top(body, ","), df.columns, "KEEP")
            df = df.select(*cols)
        elif kw == "DROP":
            cols = _expand_patterns(_split_top(body, ","), df.columns, "DROP")
            df = df.drop(*cols)
        elif kw == "RENAME":
            ren = {}
            for part in _split_top(body, ","):
                mm = re.match(rf"^\s*({_NAME})\s+AS\s+({_NAME})\s*$", part, re.I)
                if not mm:
                    raise EsqlError(f"RENAME: expected 'old AS new', got {part!r}")
                ren[mm.group(1)] = mm.group(2)
            bad = [c for c in ren if c not in df.columns]
            if bad:
                raise EsqlError(f"RENAME: unknown column(s) {bad}")
            df = df.withColumnsRenamed(ren)
        elif kw == "MV_EXPAND":
            if body not in df.columns:
                raise EsqlError(f"MV_EXPAND: unknown column {body!r}")
            df = df.withColumn(body, F.explode_outer(body))
        else:
            raise EsqlError(f"unsupported command {kw!r}")
    return df
