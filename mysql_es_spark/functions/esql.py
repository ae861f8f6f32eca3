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
  INLINESTATS a = AGG(x) [WHERE c] … [BY k…]   window aggregates —
                         per-group values attached WITHOUT collapsing
  LOOKUP JOIN t ON k     broadcast left join (the ES lookup-index model)
  FORK (p1) (p2) …       2–8 branch sub-pipes over the shared frame,
                         unioned with a `_fork` discriminator
  CHANGE_POINT v ON k    reduce to the argmax-Welch step-change row
  ENRICH policy ON key [WITH cols]   lookup-policy column attach
  DISSECT col "%{a} %{b}"            pattern extract (one JVM regexp)
  GROK col "%{IP:ip} %{NUMBER:n:int}"   canned-pattern extract (one JVM
                         regexp; ~25 most-used ES patterns, typed
                         captures via :int/:long/:float/:double/:boolean)

STATS/INLINESTATS aggregates accept a per-aggregate ``WHERE cond``
filter, compiled as a CASE wrapper inside ONE hash aggregate.

Scalar expressions are Spark SQL expressions — ES|QL's function surface
(ABS, ROUND, CONCAT, LENGTH, SUBSTRING, DATE_TRUNC, CASE, LIKE, IN …)
overlaps Spark's almost everywhere, and double-quoted string literals
parse identically. ES|QL-only spellings are rewritten at compile time:
TO_* conversions, BUCKET, the multivalue family (MV_COUNT / MV_MIN /
MV_MAX / MV_SUM / MV_AVG / MV_MEDIAN / MV_FIRST / MV_LAST / MV_DEDUPE /
MV_SORT / MV_CONCAT), date functions with ES argument order
(DATE_FORMAT / DATE_PARSE / DATE_DIFF / DATE_EXTRACT), and CIDR_MATCH
(IPv4, literal blocks → compile-time range checks). Unrewritten MV_*/
CIDR_* spellings raise EsqlError naming the supported set. Aggregates
add STD_DEV (population), WEIGHTED_AVG(v, w) and TOP(field, n, order)
beyond the Spark-shared names. Every scalar expression passes the same
purity validation as runtime fields (functions/runtime.py):
nondeterministic functions and subqueries are rejected at compile time,
so an ES|QL pipe can never smuggle in cardinality changes or side
effects.

Index integration (``esql_search``): FROM an index name reads its live
forward table, and WHERE supports ES|QL 8.16's full-text ``match(field,
"query")`` function — compiled to a left-semi join against the
postings-derived match set (presence-only decode, partition-pruned),
never a per-row text scan. ES|QL's own restriction is enforced: match()
must sit at WHERE's top level, combined only with AND.

``ENRICH policy ON key [WITH c1, c2]`` attaches columns from a
registered enrichment table by key lookup (broadcast left join — ES
enrich indexes are small by contract). ``DISSECT col "%{a} %{b}"``
compiles the dissect pattern to ONE regexp evaluated JVM-side.

Out of scope (documented): metadata fields other than _score.
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
    # ES|QL STD_DEV is the population standard deviation (Welford)
    "STD_DEV": "stddev_pop({a})",
    # WEIGHTED_AVG and TOP are multi-argument — compiled in _agg_column
    "WEIGHTED_AVG": None,
    "TOP": None,
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


def _split_keyword(s: str, kw: str) -> list[str]:
    """Split on a word-bounded keyword at depth 0, outside strings."""
    parts, depth, quote, last = [], 0, None, 0
    i, n, k = 0, len(s), len(kw)
    while i < n:
        ch = s[i]
        if quote:
            if ch == "\\":
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif (
            depth == 0
            and s[i : i + k].upper() == kw
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (i + k >= n or not (s[i + k].isalnum() or s[i + k] == "_"))
        ):
            parts.append(s[last:i])
            i += k
            last = i
            continue
        i += 1
    parts.append(s[last:])
    return parts


_MATCH_CALL = re.compile(rf'^\s*match\s*\(\s*({_NAME})\s*,\s*"((?:[^"\\]|\\.)*)"\s*\)\s*$', re.I)


def _compile_where(
    df: DataFrame, body: str, match_resolver, doc_key: str, with_score: bool = False
) -> DataFrame:
    """WHERE with optional full-text match(): ES|QL requires match() at
    the top level, AND-combined only — enforced here. Each match()
    conjunct becomes a left-semi join against the resolver's match set;
    scalar conjuncts stay one pushed-down filter.

    ``with_score`` (FROM … METADATA _score): match() conjuncts join
    their BM25 scores instead, and ``_score`` accumulates their sum —
    the ES|QL scoring contract (each full-text function contributes its
    clause score)."""
    if not re.search(r"(?i)\bmatch\s*\(", body):
        return df.filter(F.expr(_check_scalar(body, "WHERE")))
    scalars = []
    for conj in _split_keyword(body, "AND"):
        m = _MATCH_CALL.match(conj)
        if m:
            if match_resolver is None:
                raise EsqlError(
                    "WHERE match(): no match_resolver — query an index via "
                    "esql_search() to use full-text functions"
                )
            matched = match_resolver(m.group(1), m.group(2), with_score)
            if with_score:
                part = F.col("_m_score")
                if "_score" in df.columns:
                    part = part + F.col("_score")
                df = (
                    df.join(
                        matched.select(doc_key, F.col("score").alias("_m_score")),
                        doc_key,
                        "inner",
                    )
                    .withColumn("_score", part)
                    .drop("_m_score")
                )
            else:
                df = df.join(matched.select(doc_key), doc_key, "left_semi")
        elif re.search(r"(?i)\bmatch\s*\(", conj):
            raise EsqlError(
                "match() must be a top-level WHERE conjunct combined only "
                "with AND (the ES|QL full-text restriction)"
            )
        else:
            scalars.append(f"({conj.strip()})")
    if scalars:
        df = df.filter(F.expr(_check_scalar(" AND ".join(scalars), "WHERE")))
    return df


def _dissect_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile an ES dissect pattern (``%{name}`` fields between literal
    separators) to one anchored regex + the field names in order."""
    toks = re.split(r"%\{(\w*)\}", pattern)
    names, rx = [], ["^"]
    for i, t in enumerate(toks):
        if i % 2 == 0:
            rx.append(re.escape(t))
        else:
            if not t:
                raise EsqlError("DISSECT: empty field name")
            names.append(t)
            rx.append("(.*?)" if i < len(toks) - 2 else "(.*)")
    rx.append("$")
    if not names:
        raise EsqlError(f"DISSECT: pattern {pattern!r} has no %{{field}}s")
    return "".join(rx), names


_BUCKET_TIME = re.compile(
    rf"(?i)\bBUCKET\s*\(\s*({_NAME})\s*,\s*(\d+)\s+"
    r"(year|month|week|day|hour|minute|second)s?\s*\)"
)
_BUCKET_NUM = re.compile(rf"(?i)\bBUCKET\s*\(\s*({_NAME})\s*,\s*(\d+(?:\.\d+)?)\s*\)")


def _rewrite_calls(expr: str, name: str, render) -> str:
    """Rewrite every ``name(args)`` call (case-insensitive, word-bounded,
    balanced-paren, quote-aware) via ``render(list_of_arg_strings)``.

    Single forward pass — the replacement text is never re-scanned (so a
    render() may legally emit a Spark function whose spelling collides
    with the ES|QL one, e.g. date_format); nested same-name calls inside
    the argument list are handled by recursing on the inner text first."""
    pat = re.compile(rf"(?i)\b{name}\s*\(")
    out, pos = [], 0
    while True:
        m = pat.search(expr, pos)
        if m is None:
            out.append(expr[pos:])
            return "".join(out)
        depth, i, quote = 1, m.end(), None
        while i < len(expr) and depth:
            ch = expr[i]
            if quote:
                if ch == "\\":
                    i += 1
                elif ch == quote:
                    quote = None
            elif ch in "\"'":
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        if depth:
            raise EsqlError(f"{name}: unbalanced parentheses in {expr!r}")
        inner = _rewrite_calls(expr[m.end() : i - 1], name, render)
        args = [a.strip() for a in _split_top(inner, ",")]
        if args == [""]:
            args = []
        out.append(expr[pos : m.start()])
        out.append(render(args))
        pos = i


def _is_str_literal(s: str) -> bool:
    s = s.strip()
    return len(s) >= 2 and s[0] in "\"'" and s[-1] == s[0]


def _nargs(name: str, args: list, *ns: int) -> None:
    if len(args) not in ns:
        raise EsqlError(f"{name} takes {' or '.join(map(str, ns))} argument(s), got {len(args)}")


# ES|QL multivalue functions → Spark array expressions. Templates reuse
# {a} (the multivalue expression) possibly twice — pure column refs in
# practice, and Catalyst CSEs duplicated subtrees inside one projection.
_MV_SUM = "aggregate({a}, cast(0 as double), (mv_acc, mv_x) -> mv_acc + mv_x)"
_MV_TEMPLATES = {
    "MV_COUNT": "cardinality({a})",
    "MV_MIN": "array_min({a})",
    "MV_MAX": "array_max({a})",
    "MV_DEDUPE": "array_distinct({a})",
    "MV_SUM": _MV_SUM,
    "MV_AVG": f"({_MV_SUM} / nullif(cardinality({{a}}), 0))",
    "MV_FIRST": "get({a}, 0)",
    "MV_LAST": "get({a}, cardinality({a}) - 1)",
    # even cardinality → mean of the two middles (ES|QL numeric contract)
    "MV_MEDIAN": (
        "((get(array_sort({a}), cast(floor((cardinality({a}) - 1) / 2) as int))"
        " + get(array_sort({a}), cast(floor(cardinality({a}) / 2) as int))) / 2.0)"
    ),
}

# ES|QL DATE_DIFF unit names (incl. abbreviations) → Spark timestampdiff
_DATE_DIFF_UNITS = {
    "years": "YEAR", "year": "YEAR", "yyyy": "YEAR", "yy": "YEAR",
    "quarters": "QUARTER", "quarter": "QUARTER", "qq": "QUARTER", "q": "QUARTER",
    "months": "MONTH", "month": "MONTH", "mm": "MONTH", "m": "MONTH",
    "weeks": "WEEK", "week": "WEEK", "wk": "WEEK", "ww": "WEEK",
    "days": "DAY", "day": "DAY", "dd": "DAY", "d": "DAY",
    "hours": "HOUR", "hour": "HOUR", "hh": "HOUR",
    "minutes": "MINUTE", "minute": "MINUTE", "mi": "MINUTE", "n": "MINUTE",
    "seconds": "SECOND", "second": "SECOND", "ss": "SECOND", "s": "SECOND",
    "milliseconds": "MILLISECOND", "millisecond": "MILLISECOND", "ms": "MILLISECOND",
    "microseconds": "MICROSECOND", "microsecond": "MICROSECOND", "mcs": "MICROSECOND",
}

# IPv4 dotted-quad → one bigint, emitted inline (Catalyst CSEs the four
# split() calls inside a single predicate)
_IPV4_NUM = (
    "(cast(split({ip}, '[.]')[0] as bigint) * 16777216"
    " + cast(split({ip}, '[.]')[1] as bigint) * 65536"
    " + cast(split({ip}, '[.]')[2] as bigint) * 256"
    " + cast(split({ip}, '[.]')[3] as bigint))"
)


def _render_cidr_match(args: list) -> str:
    """CIDR_MATCH(ip, "block", ...) → range checks computed at compile
    time from the literal blocks (IPv4; the contract mysql-es users get
    from ES ip-range filters)."""
    import ipaddress

    if len(args) < 2:
        raise EsqlError("CIDR_MATCH takes (ip_column, block, ...)")
    ipnum = _IPV4_NUM.format(ip=args[0])
    conds = []
    for blk in args[1:]:
        if not _is_str_literal(blk):
            raise EsqlError(f"CIDR_MATCH: blocks must be string literals, got {blk!r}")
        try:
            net = ipaddress.ip_network(blk.strip()[1:-1], strict=False)
        except ValueError as e:
            raise EsqlError(f"CIDR_MATCH: bad block {blk}: {e}") from None
        if net.version != 4:
            raise EsqlError("CIDR_MATCH: only IPv4 blocks are supported")
        lo, hi = int(net.network_address), int(net.broadcast_address)
        conds.append(f"({ipnum} >= {lo} AND {ipnum} <= {hi})")
    return "(" + " OR ".join(conds) + ")"


_ES_DEFAULT_DATE_FMT = '"yyyy-MM-dd\'T\'HH:mm:ss.SSS\'Z\'"'


def _render_date_format(args: list) -> str:
    """ES|QL DATE_FORMAT([format,] date) — format FIRST, the reverse of
    Spark's date_format(date, format). A literal first argument marks the
    ES|QL order; otherwise (two non-literal args, the shape only Spark's
    own spelling produces) pass through unchanged."""
    _nargs("DATE_FORMAT", args, 1, 2)
    if len(args) == 1:
        return f"date_format({args[0]}, {_ES_DEFAULT_DATE_FMT})"
    if _is_str_literal(args[0]):
        return f"date_format({args[1]}, {args[0]})"
    return f"date_format({args[0]}, {args[1]})"


def _render_date_parse(args: list) -> str:
    """ES|QL DATE_PARSE([format,] string) → to_timestamp (format first)."""
    _nargs("DATE_PARSE", args, 1, 2)
    if len(args) == 1:
        return f"to_timestamp({args[0]})"
    return f"to_timestamp({args[1]}, {args[0]})"


def _render_date_diff(args: list) -> str:
    """ES|QL DATE_DIFF("unit", start, end) → timestampdiff(UNIT, s, e)
    (complete units elapsed). The 2-arg form is Spark's own date_diff →
    datediff passthrough."""
    if len(args) == 2:
        return f"datediff({args[0]}, {args[1]})"
    _nargs("DATE_DIFF", args, 3)
    if not _is_str_literal(args[0]):
        raise EsqlError(f"DATE_DIFF: unit must be a string literal, got {args[0]!r}")
    unit = args[0].strip()[1:-1].lower()
    if unit not in _DATE_DIFF_UNITS:
        raise EsqlError(
            f"DATE_DIFF: unsupported unit {unit!r} "
            f"(supported: {sorted(set(_DATE_DIFF_UNITS))})"
        )
    return f"timestampdiff({_DATE_DIFF_UNITS[unit]}, {args[1]}, {args[2]})"


def _render_date_extract(args: list) -> str:
    """ES|QL DATE_EXTRACT("part", date) → date_part('part', date)."""
    _nargs("DATE_EXTRACT", args, 2)
    return f"date_part({args[0]}, {args[1]})"


_MV_RESIDUAL = re.compile(r"(?i)\b(MV_[A-Z_]+|CIDR_MATCH)\s*\(")


# ---------------------------------------------------------------------------
# GROK: the most-used subset of ES's canned pattern library, inlined as
# Java-regex fragments. Every fragment is capture-free ((?:…) only) so
# %{NAME:field} ordinals line up with regexp_extract group indexes.
# ---------------------------------------------------------------------------
_GROK_BASE10NUM = r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+))"
_GROK_IPV4 = (
    r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
)
_GROK_PATTERNS = {
    "INT": r"(?:[+-]?[0-9]+)",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "BASE10NUM": _GROK_BASE10NUM,
    "NUMBER": _GROK_BASE10NUM,
    "BASE16NUM": r"(?:0[xX])?(?:[0-9A-Fa-f]+)",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"(?:\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*')",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "MAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "IPV4": _GROK_IPV4,
    "IP": _GROK_IPV4,
    "HOSTNAME": (
        r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
        r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b"
    ),
    "USER": r"[a-zA-Z0-9._-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "EMAILADDRESS": r"[a-zA-Z0-9._%+-]+@[0-9A-Za-z.-]+\.[A-Za-z]{2,}",
    "TIMESTAMP_ISO8601": (
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}"
        r"(?::\d{2}(?:\.\d+)?)?(?:Z|[+-]\d{2}:?\d{2})?"
    ),
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2}\s+[+-]\d{4}",
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE"
        r"|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?"
        r"|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE"
        r"|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)"
    ),
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "LOGLEVEL_LOWER": r"(?:alert|trace|debug|notice|info|warning|warn|error|err|critical|crit|fatal|severe|emergency|emerg)",
}
_GROK_TYPES = {"int": "int", "long": "bigint", "float": "float", "double": "double", "boolean": "boolean"}
_GROK_FIELD = re.compile(r"%\{(\w+)(?::([A-Za-z_][\w.]*))?(?::(\w+))?\}")


def _grok_regex(pattern: str) -> tuple[str, list[tuple[str, str | None]]]:
    """Compile an ES GROK pattern — raw regex text interleaved with
    ``%{SYNTAX[:field[:type]]}`` macros — into one Java regex plus the
    named captures in group order. Like Logstash/ES grok the match is
    UNANCHORED (regexp_extract does a find), and literal text between
    macros is already regex, not plain text (the DISSECT/GROK split)."""
    fields, out, pos = [], [], 0
    for m in _GROK_FIELD.finditer(pattern):
        out.append(pattern[pos : m.start()])
        name, field, typ = m.group(1), m.group(2), m.group(3)
        if name not in _GROK_PATTERNS:
            raise EsqlError(
                f"GROK: unknown pattern %{{{name}}} (supported: {sorted(_GROK_PATTERNS)})"
            )
        if typ is not None and typ not in _GROK_TYPES:
            raise EsqlError(
                f"GROK: unknown conversion type {typ!r} (supported: {sorted(_GROK_TYPES)})"
            )
        if field:
            fields.append((field, typ))
            out.append(f"({_GROK_PATTERNS[name]})")
        else:
            out.append(f"(?:{_GROK_PATTERNS[name]})")
        pos = m.end()
    out.append(pattern[pos:])
    if not fields:
        raise EsqlError(f"GROK: pattern {pattern!r} has no %{{SYNTAX:field}} captures")
    return "".join(out), fields


def _rewrite_functions(expr: str) -> str:
    """ES|QL function spellings → Spark SQL. BUCKET is the histogram
    idiom: BUCKET(ts, 1 day) → date_trunc (calendar-aligned, n must be
    1 — multi-unit fixed windows are epoch math, use EVAL), and the
    numeric BUCKET(x, width) → floor-aligned width buckets."""

    def time_sub(m: re.Match) -> str:
        if m.group(2) != "1":
            raise EsqlError(
                "BUCKET: only 1 <calendar-unit> spans are supported "
                f"(got {m.group(2)} {m.group(3)}); use an EVAL with epoch "
                "math for fixed multi-unit windows"
            )
        return f"date_trunc('{m.group(3).upper()}', {m.group(1)})"

    expr = _BUCKET_TIME.sub(time_sub, expr)
    expr = _BUCKET_NUM.sub(
        lambda m: f"(floor({m.group(1)} / {m.group(2)}) * {m.group(2)})", expr
    )
    # ES|QL TO_* conversions → Spark's cast-shorthand functions (pure
    # name substitution; argument lists pass through untouched)
    for es_name, spark_name in (
        ("TO_LONG", "bigint"), ("TO_INTEGER", "int"), ("TO_INT", "int"),
        ("TO_DOUBLE", "double"), ("TO_STRING", "string"),
        ("TO_BOOLEAN", "boolean"), ("TO_TIMESTAMP", "timestamp"),
        ("TO_DATETIME", "timestamp"), ("TO_UNSIGNED_LONG", "bigint"),
        ("TO_DEGREES", "degrees"), ("TO_RADIANS", "radians"),
        ("TO_LOWER", "lower"), ("TO_UPPER", "upper"),
        ("TO_BASE64", "base64"), ("FROM_BASE64", "unbase64"),
        ("STARTS_WITH", "startswith"), ("ENDS_WITH", "endswith"),
    ):
        expr = re.sub(rf"(?i)\b{es_name}\s*\(", f"{spark_name}(", expr)
    # multivalue / date / network spellings with no same-name Spark
    # function — argument-aware rewrites (AFTER the TO_* pass so a
    # rendered to_timestamp(...) is never re-mangled)
    for mv_name, tmpl in _MV_TEMPLATES.items():
        expr = _rewrite_calls(
            expr,
            mv_name,
            lambda args, _n=mv_name, _t=tmpl: (
                _nargs(_n, args, 1) or _t.format(a=args[0])
            ),
        )
    expr = _rewrite_calls(expr, "MV_SORT", _render_mv_sort)
    expr = _rewrite_calls(
        expr,
        "MV_CONCAT",
        lambda args: (_nargs("MV_CONCAT", args, 2) or f"array_join({args[0]}, {args[1]})"),
    )
    expr = _rewrite_calls(expr, "DATE_FORMAT", _render_date_format)
    expr = _rewrite_calls(expr, "DATE_PARSE", _render_date_parse)
    expr = _rewrite_calls(expr, "DATE_DIFF", _render_date_diff)
    expr = _rewrite_calls(expr, "DATE_EXTRACT", _render_date_extract)
    expr = _rewrite_calls(expr, "CIDR_MATCH", _render_cidr_match)
    residue = _MV_RESIDUAL.search(expr)
    if residue:
        raise EsqlError(
            f"unsupported ES|QL function {residue.group(1).upper()!r} "
            f"(supported multivalue functions: "
            f"{sorted([*_MV_TEMPLATES, 'MV_SORT', 'MV_CONCAT', 'MV_EXPAND (command)'])})"
        )
    return expr


def _render_mv_sort(args: list) -> str:
    _nargs("MV_SORT", args, 1, 2)
    if len(args) == 1:
        return f"array_sort({args[0]})"
    order = args[1].strip().strip("\"'").lower()
    if order not in ("asc", "desc"):
        raise EsqlError(f"MV_SORT: order must be \"ASC\" or \"DESC\", got {args[1]!r}")
    return f"sort_array({args[0]}, {'true' if order == 'asc' else 'false'})"


def _check_scalar(expr: str, what: str) -> str:
    expr = _rewrite_functions(expr.strip())
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


def _paren_groups(s: str, what: str) -> list[str]:
    """Top-level ``(...)`` groups: ``(a | b) (c)`` → [\"a | b\", \"c\"].
    Anything outside a group besides whitespace is an error."""
    groups, depth, quote, start = [], 0, None, -1
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
        elif ch == "(":
            if depth == 0:
                start = i
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(s[start + 1 : i])
        elif depth == 0 and not ch.isspace():
            raise EsqlError(f"{what}: unexpected {ch!r} outside a (branch)")
    if depth != 0:
        raise EsqlError(f"{what}: unbalanced parentheses")
    return groups


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


# aggregates usable as window functions (INLINESTATS): COUNT_DISTINCT
# and VALUES are excluded — Spark forbids DISTINCT aggregates over a
# window, and VALUES wraps its aggregate in a post-transform
_WINDOW_SAFE = {"COUNT", "SUM", "AVG", "MIN", "MAX", "MEDIAN", "PERCENTILE"}


def _agg_column(alias: str, expr: str, window=None) -> Column:
    # per-aggregate filter (ES|QL `STATS agg(...) WHERE cond`): compiled
    # as a CASE wrapper on the aggregated value, so filtered and
    # unfiltered aggs coexist in ONE hash aggregate — no extra pass
    parts = _split_keyword(expr.strip(), "WHERE")
    main, cond = parts[0], None
    if len(parts) == 2:
        cond = _check_scalar(parts[1], "STATS WHERE")
    elif len(parts) > 2:
        raise EsqlError(f"STATS: more than one WHERE in {expr!r}")
    m = re.match(r"^(\w+)\s*\((.*)\)\s*$", main.strip(), re.S)
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
    if cond is not None:
        arglist = _split_top(args, ",") if args != "*" else ["1"]
        arglist[0] = f"CASE WHEN ({cond}) THEN {arglist[0]} END"
        args = ", ".join(a.strip() for a in arglist)
    if fn == "PERCENTILE":
        # ES|QL PERCENTILE(field, p) takes p in 0–100; Spark's
        # percentile() wants [0, 1]
        plist = _split_top(args, ",")
        if len(plist) != 2:
            raise EsqlError(f"PERCENTILE takes (field, percentage): {expr!r}")
        args = f"{plist[0].strip()}, ({plist[1].strip()}) / 100.0"
    if fn == "WEIGHTED_AVG":
        # sum(v*w)/sum(w) with ES null semantics: a null value drops BOTH
        # the value and its weight (the CASE filter above already nulled
        # arg0 for filtered rows, so their weights drop too)
        plist = _split_top(args, ",")
        if len(plist) != 2:
            raise EsqlError(f"WEIGHTED_AVG takes (value, weight): {expr!r}")
        v, w = plist[0].strip(), plist[1].strip()
        col = F.expr(
            f"sum(({v}) * ({w})) / sum(CASE WHEN ({v}) IS NOT NULL THEN ({w}) END)"
        )
    elif fn == "TOP":
        # TOP(field, limit, "asc"|"desc") → the N extreme values as a
        # sorted multivalue (one hash aggregate; no per-group sort pass)
        plist = _split_top(args, ",")
        if len(plist) != 3:
            raise EsqlError(f"TOP takes (field, limit, order): {expr!r}")
        fld, lim, order = (p.strip() for p in plist)
        order = order.strip("\"'").lower()
        if order not in ("asc", "desc") or not re.fullmatch(r"\d+", lim):
            raise EsqlError(f"TOP: limit must be an integer and order \"asc\"/\"desc\": {expr!r}")
        asc = "true" if order == "asc" else "false"
        col = F.expr(f"slice(sort_array(collect_list({fld}), {asc}), 1, {lim})")
    else:
        col = F.expr(_AGGS[fn].format(a=args))
    if window is not None:
        if fn not in _WINDOW_SAFE:
            raise EsqlError(
                f"INLINESTATS: {fn} cannot run as a window aggregate "
                f"(supported: {sorted(_WINDOW_SAFE)})"
            )
        col = col.over(window)
    return col.alias(alias)


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
    enrich: dict[str, tuple[DataFrame, str]] | None = None,
    match_resolver=None,
    doc_key: str = "docid",
) -> DataFrame:
    """Compile an ES|QL pipe into one DataFrame plan.

    ``tables`` maps FROM names to DataFrames (pass an index's forward
    table to query an index; any DataFrame works). ``spark`` is only
    needed for the ``ROW`` literal source. ``enrich`` maps ENRICH policy
    names to (lookup_df, match_field). ``match_resolver(field, text)``
    returns the full-text match set (a ``doc_key``-keyed frame) for
    WHERE's ``match()`` — esql_search wires this to an index."""
    tables = tables or {}
    enrich = enrich or {}
    pipes = [p.strip() for p in _split_top(query, "|")]
    if not pipes or not pipes[0]:
        raise EsqlError("empty query")
    df: DataFrame | None = None
    with_score = False
    for i, cmd in enumerate(pipes):
        m = re.match(r"^(\w+)\s*(.*)$", cmd, re.S)
        if not m:
            raise EsqlError(f"cannot parse command {cmd!r}")
        kw, body = m.group(1).upper(), m.group(2).strip()
        if i == 0:
            if kw == "FROM":
                # FROM t METADATA _score: expose relevance — match()
                # conjuncts then contribute their BM25 clause scores to a
                # _score column instead of a presence-only mask
                md = re.search(r"(?is)\s+METADATA\s+(.+)$", body)
                if md:
                    fields = [x.strip() for x in md.group(1).split(",")]
                    if fields != ["_score"]:
                        raise EsqlError(
                            f"METADATA supports only _score here, got {fields}"
                        )
                    with_score = True
                    body = body[: md.start()].strip()
                names = [n.strip() for n in _split_top(body, ",")]
                missing = [n for n in names if n not in tables]
                if missing:
                    raise EsqlError(f"FROM: unknown table(s) {missing}")
                df = tables[names[0]]
                for n in names[1:]:
                    df = df.unionByName(tables[n], allowMissingColumns=True)
                if with_score:
                    # ES|QL: _score exists from FROM onward and is 0 for
                    # rows no match() scored — so a pipe with METADATA
                    # _score but no match() (or scalar-only WHERE) can
                    # still KEEP/SORT on it
                    df = df.withColumn("_score", F.lit(0.0))
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
            df = _compile_where(df, body, match_resolver, doc_key, with_score)
        elif kw == "ENRICH":
            mm = re.match(
                rf"^({_NAME})\s+ON\s+({_NAME})(?:\s+WITH\s+(.+))?$", body, re.I | re.S
            )
            if not mm:
                raise EsqlError(f"ENRICH: expected 'policy ON key [WITH cols]', got {body!r}")
            pol, on, with_ = mm.group(1), mm.group(2), mm.group(3)
            if pol not in enrich:
                raise EsqlError(f"ENRICH: unknown policy {pol!r}")
            lk, match_field = enrich[pol]
            cols = (
                [c.strip() for c in _split_top(with_, ",")]
                if with_
                else [c for c in lk.columns if c != match_field]
            )
            bad = [c for c in cols if c not in lk.columns]
            if bad:
                raise EsqlError(f"ENRICH: policy {pol!r} has no column(s) {bad}")
            side = lk.select(F.col(match_field).alias(on), *cols)
            # ES contract: enrich fields OVERRIDE existing columns of the
            # same name (never an ambiguous duplicate)
            df = df.drop(*[c for c in cols if c in df.columns and c != on])
            # ES enrich indexes are small by contract → broadcast left join
            df = df.join(F.broadcast(side), on, "left")
        elif kw == "DISSECT":
            mm = re.match(rf'^({_NAME})\s+"((?:[^"\\]|\\.)*)"\s*$', body, re.S)
            if not mm:
                raise EsqlError(f"DISSECT: expected '<col> \"pattern\"', got {body!r}")
            col, pat = mm.group(1), mm.group(2)
            if col not in df.columns:
                raise EsqlError(f"DISSECT: unknown column {col!r}")
            rx, names = _dissect_regex(pat)
            df = df.withColumns(
                {nm: F.regexp_extract(F.col(col), rx, i + 1) for i, nm in enumerate(names)}
            )
        elif kw == "GROK":
            mm = re.match(rf'^({_NAME})\s+"((?:[^"\\]|\\.)*)"\s*$', body, re.S)
            if not mm:
                raise EsqlError(f"GROK: expected '<col> \"pattern\"', got {body!r}")
            col, pat = mm.group(1), mm.group(2)
            if col not in df.columns:
                raise EsqlError(f"GROK: unknown column {col!r}")
            rx, fields = _grok_regex(pat)
            new = {}
            for i, (nm, typ) in enumerate(fields):
                c = F.regexp_extract(F.col(col), rx, i + 1)
                if typ is not None:
                    # no-match → "" → null before the cast (ANSI-safe)
                    c = F.when(c != "", c).cast(_GROK_TYPES[typ])
                new[nm] = c
            df = df.withColumns(new)
        elif kw == "EVAL":
            for a, e in _parse_assignments(body, "EVAL"):
                df = df.withColumn(a, F.expr(e))  # sequential: later sees earlier
        elif kw == "STATS":
            mby = _split_keyword(body, "BY")
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
        elif kw == "INLINESTATS":
            # aggregate columns WITHOUT collapsing rows — compiled as
            # window aggregates over the BY keys (one shuffle; unbounded
            # frame), the plan ES|QL's own docs describe as a join of
            # STATS back onto the stream
            mby = _split_keyword(body, "BY")
            from pyspark.sql import Window

            if len(mby) == 2:
                keys = _parse_assignments(mby[1], "INLINESTATS BY")
                for a, e in keys:
                    if a != e:
                        df = df.withColumn(a, F.expr(e))
                w = Window.partitionBy(*[a for a, _ in keys])
                for a, e in _parse_assignments(mby[0], "INLINESTATS"):
                    df = df.withColumn(a, _agg_column(a, e, window=w))
            else:
                # no BY: an empty window partition would funnel EVERY row
                # through one task — compute the global aggregates once
                # and attach them with a broadcast cross join instead
                aggs = [
                    _agg_column(a, e)
                    for a, e in _parse_assignments(mby[0], "INLINESTATS")
                ]
                df = df.crossJoin(F.broadcast(df.agg(*aggs)))
        elif kw == "SORT":
            df = df.orderBy(*[_sort_column(it) for it in _split_top(body, ",")])
        elif kw == "SAMPLE":
            # ES|QL 8.19 SAMPLE <p>: ES draws randomly; this engine bans
            # nondeterminism, so the sample is a content-hash threshold
            # (the random_sampler agg's contract): stable across reruns
            # and partitionings, ~p of rows kept
            mm = re.match(r"^(0?\.\d+|1(\.0+)?|0)$", body)
            if not mm:
                raise EsqlError(f"SAMPLE needs a probability in [0, 1], got {body!r}")
            prob = float(body)
            all_cols = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])
            df = df.filter(
                F.conv(F.substring(F.md5(all_cols), 1, 8), 16, 10).cast("long")
                < F.lit(int(prob * (1 << 32)))
            )
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
        elif kw == "FORK":
            # ES|QL 8.19 FORK: run each (branch sub-pipe) over the current
            # frame and union the outputs with a _fork discriminator —
            # branch schemas may differ (missing columns null-pad). The
            # upstream subtree appears once per branch in the physical
            # plan; Spark reuses identical exchanges (shuffle results)
            # across branches, but a scan-only upstream re-reads per
            # branch — cache the source first if branches are many and
            # the scan is the cost.
            branches = _paren_groups(body, "FORK")
            if not 2 <= len(branches) <= 8:
                raise EsqlError("FORK needs 2–8 (branch) sub-pipes")
            outs = []
            for bi, br in enumerate(branches, 1):
                sub = esql(
                    "FROM __fork_input__ | " + br.strip(),
                    {**tables, "__fork_input__": df},
                    spark=spark,
                    enrich=enrich,
                    match_resolver=match_resolver,
                    doc_key=doc_key,
                )
                outs.append(sub.withColumn("_fork", F.lit(f"fork{bi}")))
            df = outs[0]
            for o in outs[1:]:
                df = df.unionByName(o, allowMissingColumns=True)
        elif kw == "CHANGE_POINT":
            # ES|QL CHANGE_POINT <value> ON <key>: reduce the pipe to the
            # step-change row — argmax-Welch over the (already reduced)
            # series, the exact detector behind the change_point agg
            mm = re.match(rf"^({_NAME})\s+ON\s+({_NAME})$", body, re.I)
            if not mm:
                raise EsqlError(f"CHANGE_POINT: expected '<value> ON <key>', got {body!r}")
            val, onk = mm.group(1), mm.group(2)
            bad = [c for c in (val, onk) if c not in df.columns]
            if bad:
                raise EsqlError(f"CHANGE_POINT: unknown column(s) {bad}")
            from ..operators.aggs import change_point_series

            df = change_point_series(df, value_col=val, order_col=onk)
        elif kw == "LOOKUP":
            mm = re.match(rf"^JOIN\s+({_NAME})\s+ON\s+(.+)$", body, re.I | re.S)
            if not mm:
                raise EsqlError(f"LOOKUP: expected 'JOIN <table> ON keys', got {body!r}")
            name, keys_s = mm.group(1), mm.group(2)
            if name not in tables:
                raise EsqlError(f"LOOKUP JOIN: unknown table {name!r}")
            jkeys = [k.strip() for k in _split_top(keys_s, ",")]
            lk = tables[name]
            bad = [k for k in jkeys if k not in lk.columns or k not in df.columns]
            if bad:
                raise EsqlError(f"LOOKUP JOIN: key(s) {bad} missing on one side")
            # ES lookup indexes are single-shard and replicated to every
            # node — broadcast IS their distribution model. Duplicate
            # keys multiply rows, and lookup-side fields OVERRIDE
            # same-named input columns — both the documented ES|QL
            # behaviors (never an ambiguous duplicate column).
            df = df.drop(
                *[c for c in lk.columns if c in df.columns and c not in jkeys]
            )
            df = df.join(F.broadcast(lk), jkeys, "left")
        elif kw == "MV_EXPAND":
            if body not in df.columns:
                raise EsqlError(f"MV_EXPAND: unknown column {body!r}")
            df = df.withColumn(body, F.explode_outer(body))
        else:
            raise EsqlError(f"unsupported command {kw!r}")
    return df


def esql_search(
    query: str,
    spark: SparkSession,
    indexes: dict[str, str],
    enrich: dict[str, tuple[DataFrame, str]] | None = None,
    cfg=None,
) -> DataFrame:
    """Run an ES|QL pipe against built indexes: FROM names resolve to
    each index's LIVE forward table (soft-deleted docs masked, exactly
    like every other query path), and ``match(field, "...")`` in WHERE
    resolves through the postings — presence-only decode with partition
    pruning, then a left-semi join, never a row-wise text scan.

    match() restrictions (both ES|QL's own and this engine's honest
    ones): top-level AND-combined only; single-index FROM; the indexed
    field is ``text`` (multi-field roots have per-field sub-indexes —
    point FROM at the sub-index to match another field)."""
    from ..operators.aggs import _matched_docids
    from ..operators.query import deleted_docids, effective_config
    from ..sources import tables as tbl

    tables: dict[str, DataFrame] = {}
    for name, ix in indexes.items():
        fwd = tbl.read(spark, ix, "forward")
        dels = deleted_docids(spark, ix)
        if dels is not None:
            fwd = fwd.join(dels, "docid", "left_anti")
        tables[name] = fwd

    m = re.match(r"(?i)^\s*FROM\s+([^|]+)", query)
    from_body = (
        re.sub(r"(?is)\s+METADATA\s.*$", "", m.group(1)).strip() if m else ""
    )
    from_names = [n.strip() for n in _split_top(from_body, ",")] if m else []

    def resolver(field: str, text: str, with_score: bool = False) -> DataFrame:
        if len(from_names) != 1:
            raise EsqlError("match() needs a single-index FROM")
        ixdir = indexes.get(from_names[0])
        if ixdir is None:
            raise EsqlError(f"match(): unknown index {from_names[0]!r}")
        if field != "text":
            raise EsqlError(
                f"match(): field {field!r} is not indexed here — the indexed "
                "field is 'text' (use a multi-field sub-index for others)"
            )
        ecfg = effective_config(spark, ixdir, cfg)
        if with_score:
            # METADATA _score: the clause's full scored match set (one
            # postings decode, no rank window)
            from ..operators.query import bm25_topk_multi

            return bm25_topk_multi(
                spark, ixdir, {"q": text}, k=None, cfg=ecfg
            ).select("docid", "score")
        out = _matched_docids(spark, ixdir, text, ecfg)
        if out is None:  # no usable terms → empty match set, typed
            return tbl.local_rows_df(spark, [], "docid long")
        return out

    return esql(query, tables, spark=spark, enrich=enrich, match_resolver=resolver)
