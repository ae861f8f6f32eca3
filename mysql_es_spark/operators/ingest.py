"""ES ingest pipelines — a declarative processor chain compiled to
DataFrame transformations.

ES runs a JSON list of processors over every document before indexing
(_ingest/pipeline); the reference gets the same effect from its config
layer (river.json column projection/aliasing, Emiter.java:248-256
AliasColumns TODO). Here each processor becomes a Catalyst expression —
``withColumn`` / ``filter`` chains, whole-stage codegen, zero Python —
so a pipeline is exactly as fast as hand-written column work.

Supported processors (the ES subset that is pure column algebra):

- ``{"set":       {"field", "value"}}``            literal assign
- ``{"copy":      {"field", "target_field"}}``     ES set-with-copy_from
- ``{"rename":    {"field", "target_field"}}``
- ``{"remove":    {"field"}}``
- ``{"lowercase"|"uppercase"|"trim": {"field"}}``
- ``{"gsub":      {"field", "pattern", "replacement"}}``  (java regex)
- ``{"convert":   {"field", "type"}}``             cast
- ``{"date":      {"field", "target_field", "format"}}``  to_timestamp
- ``{"drop":      {"if": <SQL predicate>}}``       drop matching docs
- ``{"script": …}`` raises — arbitrary per-doc scripts are the
  row-at-a-time anti-pattern this engine bans from hot paths; use a
  dedicated operator instead.

Processors apply strictly in order, as ES does. Unknown processor names
and unknown fields fail at compile time (ES fails at ingest time; we can
do better because the schema is static).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_pipeline(df: DataFrame, processors: list[dict]) -> DataFrame:
    """Run the processor chain over ``df`` (validating each step against
    the current schema) and return the transformed frame."""
    for i, proc in enumerate(processors):
        if len(proc) != 1:
            raise ValueError(f"processor #{i} must have exactly one key, got {sorted(proc)}")
        (name, p), = proc.items()
        cols = set(df.columns)

        def need(field: str):
            if field not in cols:
                raise ValueError(f"processor #{i} ({name}): unknown field {field!r}")

        if name == "set":
            df = df.withColumn(p["field"], F.lit(p["value"]))
        elif name == "copy":
            need(p["field"])
            df = df.withColumn(p["target_field"], F.col(p["field"]))
        elif name == "rename":
            need(p["field"])
            if p["target_field"] in cols:
                raise ValueError(
                    f"processor #{i} (rename): target {p['target_field']!r} exists"
                )
            df = df.withColumnRenamed(p["field"], p["target_field"])
        elif name == "remove":
            need(p["field"])
            df = df.drop(p["field"])
        elif name in ("lowercase", "uppercase", "trim"):
            need(p["field"])
            fn = {"lowercase": F.lower, "uppercase": F.upper, "trim": F.trim}[name]
            df = df.withColumn(p["field"], fn(F.col(p["field"])))
        elif name == "gsub":
            need(p["field"])
            df = df.withColumn(
                p["field"],
                F.regexp_replace(F.col(p["field"]), p["pattern"], p["replacement"]),
            )
        elif name == "convert":
            need(p["field"])
            df = df.withColumn(p["field"], F.col(p["field"]).cast(p["type"]))
        elif name == "date":
            need(p["field"])
            df = df.withColumn(
                p.get("target_field", p["field"]),
                F.to_timestamp(F.col(p["field"]), p["format"]),
            )
        elif name == "drop":
            df = df.filter(f"NOT ({p['if']})")
        elif name == "script":
            raise ValueError(
                "script processors are not supported (per-doc scripts are the "
                "row-at-a-time anti-pattern); use a dedicated operator"
            )
        else:
            raise ValueError(f"processor #{i}: unknown processor {name!r}")
    return df


def simulate_pipeline(
    spark, processors: list[dict], docs: list[dict]
) -> list[dict]:
    """ES ``_ingest/pipeline/_simulate``: run the processor chain over a
    handful of literal documents and return the transformed docs —
    pipeline debugging without touching any table. Same compile path as
    apply_pipeline (schema-validated Catalyst column algebra), so what
    simulate shows IS what ingest will do. All docs must share a key set
    (one schema, as an index's mapping would impose)."""
    if not docs:
        return []
    keys = sorted(docs[0])
    if any(sorted(d) != keys for d in docs):
        raise ValueError("_simulate docs must share one field set")
    df = spark.createDataFrame([tuple(d[k] for k in keys) for d in docs], keys)
    out = apply_pipeline(df, processors)
    return [r.asDict(recursive=True) for r in out.collect()]
