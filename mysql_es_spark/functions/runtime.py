"""Runtime fields — ES ``runtime_mappings``, Spark-first.

ES runtime fields are per-document scripts evaluated at query time and
usable in filter context, sort, and aggregations without reindexing
(the reference's users get them for free from ES once docs land,
template.json's dynamic mapping being the static half). The Spark-native
analog: a runtime field is a **SQL expression over the forward table's
columns**, compiled to a Catalyst Column — it rides whole-stage codegen,
column pruning still reaches the parquet scan (only the expression's
source columns are read), and no Python runs per row.

Validation mirrors this repo's ingest pipelines (script processors are
rejected by design): expressions must be deterministic per-document
transforms. Nondeterministic functions, subqueries, aggregates, window
functions, and generators are all rejected at compile time with a clear
error — a runtime field can never change the row count or depend on
anything but its own document.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
# per-document determinism: anything time-, randomness-, partition- or
# JVM-reflection-dependent is out (ES runtime fields are also pure
# doc-value transforms in practice)
_FORBIDDEN = re.compile(
    r"(?i)\b(rand|randn|random|uuid|shuffle|current_timestamp|now|"
    r"current_date|localtimestamp|current_timezone|"
    r"monotonically_increasing_id|input_file_name|spark_partition_id|"
    r"reflect|java_method|current_user|session_user|user)\s*\("
)
_SUBQUERY = re.compile(r"(?i)\(\s*select\b")
# analyzed-plan nodes that change cardinality or scope beyond one row
_BAD_PLAN = ("Aggregate", "Window", "Generate", "Join")


def compile_runtime_fields(df: DataFrame, mappings: dict[str, str]) -> DataFrame:
    """Attach every runtime field in ``mappings`` (name → SQL expression
    over ``df``'s columns) as a real column, validating each expression
    analyzes cleanly and stays a pure per-row transform.

    All expressions are evaluated against the ORIGINAL columns (ES
    scripts read the doc's mapped fields), so runtime fields cannot see
    each other and shadowing a mapped field — allowed, as in ES — never
    feeds back into a sibling definition.
    """
    if not mappings:
        return df
    cols: dict[str, F.Column] = {}
    for name, expr in mappings.items():
        if not _NAME_RE.match(name or ""):
            raise ValueError(f"bad runtime field name {name!r}")
        if not isinstance(expr, str) or not expr.strip():
            raise ValueError(f"runtime field {name!r} needs a SQL expression string")
        if _FORBIDDEN.search(expr):
            raise ValueError(
                f"runtime field {name!r} uses a nondeterministic/side-effect "
                f"function — runtime fields must be pure per-document transforms"
            )
        if _SUBQUERY.search(expr):
            raise ValueError(f"runtime field {name!r} must not contain a subquery")
        try:
            probe = df.select(F.expr(expr).alias(name))
        except Exception as e:  # AnalysisException, ParseException
            raise ValueError(f"runtime field {name!r} does not compile: {e}") from None
        plan = probe._jdf.queryExecution().analyzed().toString()
        for node in _BAD_PLAN:
            if re.search(rf"^\s*:?[+-]*\s*{node} ", plan, re.M) or plan.startswith(
                f"{node} "
            ):
                raise ValueError(
                    f"runtime field {name!r} is not a per-document expression "
                    f"(plan contains {node})"
                )
        cols[name] = F.expr(expr)
    # one withColumns: every expression binds to the pre-mapping frame
    return df.withColumns(cols)


def runtime_source_columns(df: DataFrame, mappings: dict[str, str]) -> set[str]:
    """The source columns a set of runtime mappings actually reads —
    lets callers prove column pruning (only these + the keys reach the
    scan)."""
    cols = set()
    lowered = {c.lower(): c for c in df.columns}
    for expr in mappings.values():
        for tok in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", expr):
            c = lowered.get(tok.lower())
            if c:
                cols.add(c)
    return cols
