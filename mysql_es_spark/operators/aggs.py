"""ES search aggregations over the posting index — the ``aggs`` DSL.

The reference syncs MySQL rows into ES indexes whose whole purpose is to
serve search requests that carry an ``aggs`` block next to the ``query``
block (/root/reference/etc/template.json keyword/date subfields exist
*for* bucketing; Es.java:79-126 creates the index those dashboards hit).
This module re-expresses the core ES aggregation families over our own
index tables as pure DataFrame plans:

- ``date_histogram``       calendar buckets of matching docs
- ``histogram``            fixed-interval numeric buckets (over doc length)
- ``extended_stats``       count/min/max/sum/avg/variance/stddev
- ``cardinality``          distinct count of a keyword field
- ``top_hits``             per-bucket top-N scored hits
- ``significant_terms``    terms over-represented in the matched set (JLH)

Every aggregation runs over **all** docs matching the query — never the
top-k — exactly like ES, where the agg phase consumes the full hit
iterator. Plan shape at scale: the matched docid set is decoded from the
query terms' postings only (query-proportional, partition + row-group
pruned), the dimension columns come from a column-pruned forward /
doc_lens scan, the two meet in one docid shuffle, and the aggregation
itself is a map-side-combining hash agg. Nothing is ever collected to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..config import IndexConfig
from ..sources import tables as tbl
from .query import (
    _decode_docids,
    _decode_scores,
    _mask_deleted,
    _matching_blocks,
    corpus_stats,
    deleted_docids,
    effective_config,
    query_terms,
    term_meta,
)


def _matched_docids(
    spark: SparkSession, index_dir: str, query: str, cfg: IndexConfig
) -> DataFrame | None:
    """Distinct docids of docs matching ``query`` (disjunctive), or None
    for an empty/unknown-terms query. Presence-only decode: blobs of
    non-query terms are never read (partition + row-group pruning)."""
    terms = query_terms(query)
    if not terms:
        return None
    stats = corpus_stats(spark, index_dir)
    idf, buckets = term_meta(spark, index_dir, terms, stats["n_docs"], cfg)
    terms = [t for t in terms if t in idf]
    if not terms:
        return None
    blocks = _matching_blocks(spark, index_dir, terms, buckets)
    return _mask_deleted(_decode_docids(blocks), deleted_docids(spark, index_dir))


def date_histogram(
    spark: SparkSession,
    index_dir: str,
    query: str,
    interval: str = "day",
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``date_histogram`` over matching docs: one row per calendar
    ``interval`` bucket of the forward ``ts`` column with its doc count.
    Empty buckets are omitted (ES ``min_doc_count: 1``). Day-or-coarser
    buckets key as ``yyyy-MM-dd``; sub-day buckets keep the full
    truncated timestamp so distinct hours don't collapse."""
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [], "period string, n_docs long")
    fwd = tbl.read(spark, index_dir, "forward").select("docid", "ts")
    return (
        matched.join(fwd, "docid", "inner")
        .groupBy(_period_col(interval).alias("period"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("period")
    )


def _period_col(interval: str, ts: str = "ts"):
    """Bucket key for a date_histogram interval (see date_histogram)."""
    fmt = (
        "yyyy-MM-dd"
        if interval in ("day", "week", "month", "quarter", "year")
        else "yyyy-MM-dd HH:mm:ss"
    )
    return F.date_format(F.date_trunc(interval, ts), fmt)


def histogram(
    spark: SparkSession,
    index_dir: str,
    query: str,
    interval: int = 20,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES numeric ``histogram`` with fixed ``interval`` over the analyzed
    doc length (the one numeric the index itself owns): one row per
    ``floor(dl / interval) * interval`` bucket with its doc count."""
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [], "bucket long, n_docs long")
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    return (
        matched.join(dls, "docid", "inner")
        .groupBy((F.floor(F.col("dl") / interval) * interval).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bucket")
    )


def extended_stats(
    spark: SparkSession,
    index_dir: str,
    query: str,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``extended_stats`` of the analyzed doc length over matching
    docs: count, min, max, sum, avg, population variance and stddev (ES
    reports the population moments, not the sample ones)."""
    cfg = effective_config(spark, index_dir, cfg)
    schema = (
        "n_docs long, min_dl long, max_dl long, sum_dl long, "
        "avg_dl double, var_dl double, std_dl double"
    )
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [], schema)
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    return matched.join(dls, "docid", "inner").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("dl").alias("min_dl"),
        F.max("dl").alias("max_dl"),
        F.sum("dl").alias("sum_dl"),
        F.avg("dl").alias("avg_dl"),
        F.var_pop("dl").alias("var_dl"),
        F.stddev_pop("dl").alias("std_dl"),
    )


def percentiles(
    spark: SparkSession,
    index_dir: str,
    query: str,
    pcts: list[float] = (0.25, 0.5, 0.75, 0.95, 0.99),
    cfg: IndexConfig | None = None,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """ES ``percentiles`` agg over the matched docs' analyzed length:
    one row per requested percentile with its linearly-interpolated
    value. ``exact=False`` switches to ``approx_percentile`` (Spark's
    KLL-style sketch — the scale path ES's TDigest plays; the sketch,
    not the values, crosses the shuffle)."""
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [], "pct double, value double")
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    ps = [float(p) for p in pcts]
    agg = (
        F.percentile("dl", F.lit(ps))
        if exact
        else F.percentile_approx("dl", F.lit(ps), F.lit(int(accuracy)))
    )
    row = matched.join(dls, "docid", "inner").agg(agg.alias("vals"))
    pairs = F.arrays_zip(
        F.lit(ps).alias("pct"), F.col("vals").cast("array<double>").alias("value")
    )
    return (
        row.select(F.explode(pairs).alias("z"))
        .select(F.col("z.pct").alias("pct"), F.col("z.value").alias("value"))
        .orderBy("pct")
    )


def cardinality(
    spark: SparkSession,
    index_dir: str,
    query: str,
    field: str,
    cfg: IndexConfig | None = None,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """ES ``cardinality`` agg: distinct count of a forward keyword field
    over matching docs. ``exact=True`` is a two-level hash agg (partial
    distinct map-side); ``exact=False`` is HyperLogLog++ with relative
    standard deviation ``rsd`` — the literal ES algorithm — and never
    shuffles more than the sketch."""
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [], "n_values long")
    fwd = tbl.read(spark, index_dir, "forward").select("docid", field)
    joined = matched.join(fwd, "docid", "inner")
    agg = (
        F.countDistinct(field) if exact else F.approx_count_distinct(field, rsd)
    ).alias("n_values")
    return joined.agg(agg)


def top_hits(
    spark: SparkSession,
    index_dir: str,
    query: str,
    group_col: str,
    size: int = 3,
    cfg: IndexConfig | None = None,
    order_round: int | None = None,
) -> DataFrame:
    """ES ``terms`` agg with a ``top_hits`` sub-agg: for every value of
    ``group_col``, the ``size`` best BM25 hits for ``query``.

    ES computes this by keeping a per-bucket priority queue while the hit
    iterator streams; the distributed equivalent is a rank window
    partitioned by the bucket key — the scored rows shuffle once on the
    key and each partition keeps its local top ``size`` (no global sort,
    no driver materialization). Ties break (score desc, docid asc) like
    every other ranking in the engine. ``order_round`` ranks on the score
    rounded to that many decimals — the cross-engine determinism contract
    used by the driver oracle (both engines then rank identical keys).
    """
    cfg = effective_config(spark, index_dir, cfg)
    terms = query_terms(query)
    schema = f"{group_col} string, docid long, score double, rank int"
    stats = corpus_stats(spark, index_dir)
    if not terms:
        return tbl.local_rows_df(spark, [], schema)
    idf, buckets = term_meta(spark, index_dir, terms, stats["n_docs"], cfg)
    terms = [t for t in terms if t in idf]
    if not terms:
        return tbl.local_rows_df(spark, [], schema)
    blocks = _matching_blocks(spark, index_dir, terms, buckets)
    scored = _decode_scores(
        blocks, idf, cfg, stats["avgdl"], deleted_docids(spark, index_dir)
    )
    fwd = tbl.read(spark, index_dir, "forward").select("docid", group_col)
    key = F.round("score", order_round) if order_round is not None else F.col("score")
    w = W.partitionBy(group_col).orderBy(key.desc(), F.col("docid").asc())
    return (
        scored.join(fwd, "docid", "inner")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= size)
        .select(group_col, "docid", "score", "rank")
    )


def significant_terms(
    spark: SparkSession,
    index_dir: str,
    query: str,
    size: int = 10,
    min_doc_count: int = 3,
    cfg: IndexConfig | None = None,
    filter_duplicate_text: bool = False,
) -> DataFrame:
    """ES ``significant_terms``: terms over-represented in the matched
    docs relative to the whole corpus, scored with ES's JLH heuristic

        jlh = (fg% - bg%) * (fg% / bg%)

    where fg% = df_matched / n_matched and bg% = df_corpus / n_corpus,
    keeping only terms with fg% > bg% and df_matched >= min_doc_count
    (ES defaults to a min doc count for exactly this noise reason).

    The foreground frequencies come from one tokenize pass over the
    matched docs' forward text (query-proportional — ES likewise re-reads
    the matched docs' term vectors); the background frequencies are free:
    they are the index's own ``term_dict.df``. The fg-tokenize output
    joins term_dict on the term — a short-key equi-join, never a scan of
    the postings — so the whole agg is two narrow shuffles regardless of
    corpus size.
    """
    from .postings import tokenized

    cfg = effective_config(spark, index_dir, cfg)
    schema = "term string, fg_df long, bg_df long, jlh double"
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [], schema)
    stats = corpus_stats(spark, index_dir)
    n_bg = int(stats["n_docs"])
    fwd = tbl.read(spark, index_dir, "forward").select("docid", "text")
    matched_docs = matched.join(fwd, "docid", "inner")
    if filter_duplicate_text:
        # ES significant_text's flagship knob: exact-duplicate analyzed
        # texts contribute ONCE, so boilerplate/copypasta can't fake
        # significance. Lowest-docid representative per fingerprint — a
        # window keyed by fp (never global), then n_fg counts survivors.
        from .dedup import exact_dedup

        keep = exact_dedup(matched_docs, id_col="docid").select("docid")
        matched_docs = matched_docs.join(keep, "docid", "inner")
    n_fg = matched_docs.count()
    if n_fg == 0:
        return tbl.local_rows_df(spark, [], schema)
    # tokenized() emits one row per (doc, distinct term) + a null-term dl
    # row per doc — the non-null rows ARE the foreground doc frequencies
    base = IndexConfig(k1=cfg.k1, b=cfg.b)  # plain analyzer: no ngram expansion
    fg = (
        tokenized(matched_docs, base)
        .filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fg_df"))
        .filter(F.col("fg_df") >= int(min_doc_count))
    )
    bg = tbl.read(spark, index_dir, "term_dict").select("term", F.col("df").alias("bg_df"))
    fg_pct = F.col("fg_df") / F.lit(float(n_fg))
    bg_pct = F.col("bg_df") / F.lit(float(n_bg))
    return (
        fg.join(bg, "term", "inner")
        .withColumn("jlh", (fg_pct - bg_pct) * (fg_pct / bg_pct))
        .filter(fg_pct > bg_pct)
        .orderBy(F.round("jlh", 9).desc(), F.col("term").asc())
        .limit(size)
    )


def range_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    ranges: list[tuple[float | None, float | None]],
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``range`` aggregation over the analyzed doc length: one row per
    explicit [from, to) range (None = open end) with its matching-doc
    count. Ranges may overlap — a doc lands in every range covering it,
    exactly like ES (each range is an independent bucket filter). Buckets
    are keyed "from-to" with ES's "*" for an open end; empty buckets are
    KEPT (ES range aggs always emit every requested bucket)."""
    cfg = effective_config(spark, index_dir, cfg)

    def key(lo, hi):
        def side(v):
            if v is None:
                return "*"
            return str(int(v)) if float(v).is_integer() else str(v)

        return f"{side(lo)}-{side(hi)}"

    keys = [key(lo, hi) for lo, hi in ranges]
    if len(set(keys)) != len(keys):
        raise ValueError(f"range bucket labels collide: {keys}")
    empty = tbl.local_rows_df(
        spark, [(k, 0) for k in keys], "bucket string, n_docs long"
    )
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return empty.orderBy("bucket")
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    m = matched.join(dls, "docid", "inner")
    # one pass: per range a conditional count — no per-range scan/union
    aggs = []
    for (lo, hi), k in zip(ranges, keys):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("dl") >= lo)
        if hi is not None:
            cond = cond & (F.col("dl") < hi)
        # coalesce: an agg over ZERO matched rows (every matching doc
        # soft-deleted) returns NULL sums — the contract is count 0
        aggs.append(
            F.coalesce(F.sum(F.when(cond, 1)), F.lit(0)).cast("long").alias(k)
        )
    row = m.agg(*aggs)
    # unpivot the single row into (bucket, n_docs) — keeps requested order
    pairs = ", ".join(f"'{k}', `{k}`" for k in keys)
    return row.selectExpr(f"stack({len(keys)}, {pairs}) AS (bucket, n_docs)")


def filters_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    filters: dict[str, str],
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``filters`` aggregation: named SQL predicates over the forward
    columns, each an independent bucket counting the matching docs that
    also satisfy it (the ES request's aggs.filters.filters block, where
    each named filter is a query clause). One conditional-count pass —
    never one scan per filter. Empty buckets are kept."""
    cfg = effective_config(spark, index_dir, cfg)
    names = list(filters)
    empty = tbl.local_rows_df(
        spark, [(n, 0) for n in names], "bucket string, n_docs long"
    )
    if not filters:
        raise ValueError("filters_agg needs at least one named filter")
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return empty.orderBy("bucket")
    fwd = tbl.read(spark, index_dir, "forward")
    m = matched.join(fwd, "docid", "inner")
    aggs = [
        F.coalesce(F.sum(F.when(F.expr(pred), 1)), F.lit(0)).cast("long").alias(n)
        for n, pred in filters.items()
    ]
    row = m.agg(*aggs)
    pairs = ", ".join(f"'{n}', `{n}`" for n in names)
    return row.selectExpr(f"stack({len(names)}, {pairs}) AS (bucket, n_docs)")


def _composite_sources(sources: list) -> list[tuple[str, str, object]]:
    """Normalize composite sources to (out_name, forward_field, key expr).

    A plain string is shorthand for a terms source named after its field;
    the dict form is ES's: ``{name: {"terms"|"histogram"|"date_histogram":
    {...}}}`` — histogram keys are floor(value/interval)*interval, date
    keys the calendar truncation ``_period_col`` uses everywhere else."""
    out: list[tuple[str, str, object]] = []
    for s in sources:
        if isinstance(s, str):
            out.append((s, s, F.col(s)))
            continue
        (name, spec), = s.items()
        (stype, p), = spec.items()
        field = p["field"]
        if stype == "terms":
            col = F.col(field)
        elif stype == "histogram":
            iv = float(p["interval"])
            col = (F.floor(F.col(field) / iv) * iv).cast("double")
        elif stype == "date_histogram":
            col = _period_col(p["calendar_interval"], field)
        else:
            raise ValueError(f"composite source {name!r}: unknown type {stype!r}")
        out.append((name, field, col))
    return out


def composite_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    sources: list,
    size: int = 10,
    after: tuple | None = None,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``composite`` aggregation: paginate ALL buckets of a multi-source
    group-by in deterministic (source-tuple asc, nulls first) order, one
    page of ``size`` buckets per call, resuming strictly after the
    ``after`` key — the ES API for exporting every bucket when a terms
    agg's top-N cutoff won't do (ETL / downstream joins).

    ``sources`` mixes all three ES source types: a string (terms source
    over that forward field) or ``{name: {"terms"|"histogram"|
    "date_histogram": {...}}}`` (see :func:`_composite_sources`).

    Page cost at scale: one matched-docid decode + one hash agg + a
    TakeOrdered of ``size`` rows; the after-key is a lexicographic filter
    pushed before the limit, so deep pages never materialize earlier
    buckets (the same O(page) contract as search_after for hits).
    ``after`` values must be non-null (a page boundary never lands on the
    nulls-first prefix once paging has begun).
    """
    cfg = effective_config(spark, index_dir, cfg)
    srcs = _composite_sources(sources)
    names = [n for n, _f, _c in srcs]
    fields = list(dict.fromkeys(f for _n, f, _c in srcs))
    matched = _matched_docids(spark, index_dir, query, cfg)
    fwd = tbl.read(spark, index_dir, "forward").select("docid", *fields)
    keyed_cols = [c.alias(n) for n, _f, c in srcs]
    if matched is None:
        # empty page with the REAL key types (a string stand-in would
        # break paging loops that union/compare pages)
        return (
            fwd.limit(0)
            .select(*keyed_cols)
            .withColumn("n_docs", F.lit(0).cast("long"))
        )
    g = (
        matched.join(fwd, "docid", "inner")
        .select(*keyed_cols)
        .groupBy(*names)
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    if after is not None:
        if len(after) != len(names):
            raise ValueError("after key arity must match sources")
        cond = F.lit(False)
        for i in reversed(range(len(names))):
            gt_i = F.col(names[i]) > F.lit(after[i])
            for j in range(i):
                gt_i = gt_i & F.col(names[j]).eqNullSafe(F.lit(after[j]))
            cond = cond | gt_i
        g = g.filter(cond)
    return g.orderBy(*[F.asc_nulls_first(n) for n in names]).limit(size)


# ---------------------------------------------------------------------------
# agg tree — ES nested sub-aggregations


_METRIC_FNS = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "value_count": lambda c: F.count(F.col(c)),
    "cardinality": F.countDistinct,
}


def _parse_agg_tree(spec: dict) -> list[tuple[str, str, int, list[tuple[str, str, str]]]]:
    """Flatten an ES ``aggs`` spec into one (name, field, size, metrics)
    tuple per nesting level. Each level is a ``terms`` bucket agg whose
    ``aggs`` block may hold metric aggs (avg/sum/min/max/value_count/
    cardinality) plus at most one nested ``terms`` agg (ES allows sibling
    bucket aggs; a flattened DataFrame result needs one bucket path)."""
    levels = []
    node = spec
    while node:
        if len(node) != 1:
            raise ValueError("each aggs level must hold exactly one terms agg")
        (name, body), = node.items()
        if "terms" not in body:
            raise ValueError(f"agg {name!r} is not a terms aggregation")
        field = body["terms"]["field"]
        size = int(body["terms"].get("size", 10))
        metrics: list[tuple[str, str, str]] = []
        child = None
        for sub_name, sub in (body.get("aggs") or {}).items():
            if "terms" in sub:
                if child is not None:
                    raise ValueError("at most one nested terms agg per level")
                child = {sub_name: sub}
            else:
                (kind, mbody), = sub.items()
                if kind not in _METRIC_FNS:
                    raise ValueError(f"unsupported metric agg {kind!r}")
                metrics.append((sub_name, kind, mbody["field"]))
        levels.append((name, field, size, metrics))
        node = child
    return levels


def agg_tree(
    spark: SparkSession,
    index_dir: str,
    query: str,
    spec: dict,
    cfg: IndexConfig | None = None,
    runtime_mappings: dict[str, str] | None = None,
) -> DataFrame:
    """ES nested aggregations: a ``terms`` bucket tree with per-bucket
    metric sub-aggs, flattened to one row per deepest bucket.

    ``runtime_mappings`` (ES runtime fields): name → SQL expression over
    the forward columns; bucket and metric fields may name them, so
    aggregating on a query-time computed value needs no reindex.

    ``spec`` is the ES ``aggs`` JSON shape::

        {"by_lang": {"terms": {"field": "role", "size": 5},
                     "aggs": {"avg_dl": {"avg": {"field": "dl"}},
                              "by_src": {"terms": {"field": "tool", "size": 3},
                                         "aggs": {"max_dl": {"max": {"field": "dl"}}}}}}}

    ES semantics reproduced exactly: buckets are the top-``size`` keys by
    doc count (tie: key asc) *within their parent bucket*; null keys are
    dropped (ES ``missing`` unset); metric aggs at a level run over ALL
    docs of that bucket, not just the docs of surviving child buckets.
    Fields come from the forward table, plus ``dl`` from doc_lens.

    Plan shape at scale: one matched-docid decode (query-proportional,
    pruned — see module docstring), then one map-side-combining hash agg
    per nesting level. Parent top-N is a distributed TakeOrdered at the
    root and a row_number window partitioned by the parent keys below it
    (both run on post-agg bucket rows, never on doc rows). Level frames
    join on low-cardinality bucket keys — broadcast-sized by
    construction. Metrics like avg/cardinality don't decompose over a
    truncated child tree, so the per-level passes are the scale-correct
    form (L ≤ 3 in practice).
    """
    cfg = effective_config(spark, index_dir, cfg)
    levels = _parse_agg_tree(spec)
    fields: list[str] = []
    for _, field, _, metrics in levels:
        fields.append(field)
        fields.extend(mf for _, _, mf in metrics)
    fields = list(dict.fromkeys(fields))
    rt = runtime_mappings or {}
    fwd_cols = [c for c in fields if c != "dl" and c not in rt]
    base = tbl.read(spark, index_dir, "forward")
    if rt:
        from ..functions.runtime import compile_runtime_fields

        base = compile_runtime_fields(base, rt)
    base = base.select("docid", *fwd_cols, *[c for c in fields if c in rt])
    if "dl" in fields and "dl" not in rt:
        base = base.join(tbl.read(spark, index_dir, "doc_lens").select("docid", "dl"), "docid")
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:  # no usable query terms → zero rows, typed plan intact
        matched = tbl.local_rows_df(spark, [], "docid long")
    base = matched.join(base, "docid", "inner")

    out: DataFrame | None = None
    path: list[str] = []
    for name, field, size, metrics in levels:
        lvl = base
        for f_prev in [*path, field]:
            lvl = lvl.filter(F.col(f_prev).isNotNull())
        cnt = f"{name}_count"
        g = lvl.groupBy(*path, field).agg(
            F.count(F.lit(1)).alias(cnt),
            *[_METRIC_FNS[kind](mfield).alias(mname) for mname, kind, mfield in metrics],
        )
        if not path:
            g = g.orderBy(F.col(cnt).desc(), F.col(field).asc()).limit(size)
        else:
            w = W.partitionBy(*path).orderBy(F.col(cnt).desc(), F.col(field).asc())
            g = (
                g.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= size)
                .drop("__rn")
            )
        out = g if out is None else out.join(g, path, "inner")
        path.append(field)
    assert out is not None
    return out


def pipeline_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    interval: str = "day",
    window: int = 3,
    script: str | None = None,
    selector: str | None = None,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES pipeline aggregations — ``cumulative_sum``, ``derivative``,
    ``moving_fn`` (unweighted avg), ``bucket_script``, ``bucket_selector``
    — over a ``date_histogram`` parent.

    ES pipeline aggs post-process the PARENT aggregation's bucket stream,
    never the hit set (they are declared as siblings of the parent's
    sub-aggs and run after the reduce phase). Mirrored here: the parent
    histogram is the usual distributed matched-docids ⋈ forward
    aggregation; the pipeline pass is a window over its OUTPUT ordered by
    bucket key. The window is intentionally single-partition — its input
    cardinality is the bucket count (∝ time range, never corpus size),
    which is the one place a global window is scale-safe.

    Per bucket this emits: ``n_docs``; ``cum_docs`` (cumulative_sum);
    ``deriv`` (first-order derivative — null in the first bucket, exactly
    like ES, which emits no derivative for the first bucket); and
    ``moving_avg`` — the unweighted mean of the ``window`` buckets
    strictly BEFORE the current one (the ES ``moving_fn`` default
    ``shift=0`` frame), null while the frame is empty. ``script`` is a
    bucket_script: a SQL expression over the bucket columns, emitted as
    ``script_val``. ``selector`` is a bucket_selector predicate; failing
    buckets are dropped AFTER every pipeline value is computed (ES
    applies selectors last, so a dropped bucket still contributes to its
    neighbours' windows).

    Reference context: the ES indexes the reference maintains exist to
    serve dashboard queries (Es.java:79-126 index bootstrap); date-series
    panels (rates, running totals, smoothing) are pipeline aggs over
    date_histogram.
    """
    if window < 1:
        raise ValueError(f"pipeline_agg: window must be >= 1, got {window}")
    hist = date_histogram(spark, index_dir, query, interval, cfg)
    w = W.orderBy("period")
    out = hist.select(
        "period",
        "n_docs",
        F.sum("n_docs").over(w).alias("cum_docs"),
        (F.col("n_docs") - F.lag("n_docs", 1).over(w)).alias("deriv"),
        F.avg("n_docs").over(w.rowsBetween(-window, -1)).alias("moving_avg"),
    )
    if script is not None:
        out = out.withColumn("script_val", F.expr(script))
    if selector is not None:
        out = out.where(F.expr(selector))
    return out.orderBy("period")


def date_range_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    ranges: list[tuple[str | None, str | None]],
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``date_range`` aggregation: explicit [from, to) date boundaries
    over the forward ``ts`` column, one bucket per requested range (open
    ends allowed, overlaps allowed, empty buckets KEPT — the same bucket
    contract as the numeric ``range`` agg). Keys are "from-to" with ES's
    "*" for an open end. One conditional-count pass, never a scan per
    range."""
    cfg = effective_config(spark, index_dir, cfg)
    keys = [f"{lo or '*'}-{hi or '*'}" for lo, hi in ranges]
    if len(set(keys)) != len(keys):
        raise ValueError(f"date_range bucket labels collide: {keys}")
    empty = tbl.local_rows_df(spark, [(k, 0) for k in keys], "bucket string, n_docs long")
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return empty.orderBy("bucket")
    fwd = tbl.read(spark, index_dir, "forward").select("docid", "ts")
    m = matched.join(fwd, "docid", "inner")
    aggs = []
    for (lo, hi), k in zip(ranges, keys):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("ts") >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            cond = cond & (F.col("ts") < F.lit(hi).cast("timestamp"))
        aggs.append(F.coalesce(F.sum(F.when(cond, 1)), F.lit(0)).cast("long").alias(k))
    row = m.agg(*aggs)
    pairs = ", ".join(f"'{k}', `{k}`" for k in keys)
    return row.selectExpr(f"stack({len(keys)}, {pairs}) AS (bucket, n_docs)")


def multi_terms_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    fields: list[str],
    size: int = 10,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``multi_terms`` aggregation: buckets keyed by a TUPLE of forward
    fields, top-``size`` by doc count (tie: key tuple asc) — the terms agg
    generalized to composite keys without composite-agg paging. Docs
    missing ANY key field are dropped (ES multi_terms has no per-source
    ``missing`` default). One hash agg + a distributed TakeOrdered of
    ``size`` bucket rows."""
    cfg = effective_config(spark, index_dir, cfg)
    if not fields:
        raise ValueError("multi_terms_agg needs at least one field")
    matched = _matched_docids(spark, index_dir, query, cfg)
    fwd = tbl.read(spark, index_dir, "forward").select("docid", *fields)
    if matched is None:
        return fwd.limit(0).select(*fields).withColumn("n_docs", F.lit(0).cast("long"))
    m = matched.join(fwd, "docid", "inner")
    for f_ in fields:
        m = m.filter(F.col(f_).isNotNull())
    return (
        m.groupBy(*fields)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), *[F.asc(f_) for f_ in fields])
        .limit(size)
    )


def rare_terms_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    field: str,
    max_doc_count: int = 1,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``rare_terms`` aggregation: the long-tail counterpart of terms —
    buckets of ``field`` values whose matched-doc count is ≤
    ``max_doc_count``, ordered count asc then key asc (ES emits rare
    buckets rarest-first). The ES implementation prunes with a CuckooFilter
    to bound memory; here the full hash agg IS the scale-safe form (bucket
    rows ∝ field cardinality, post-agg filtered, never collected)."""
    cfg = effective_config(spark, index_dir, cfg)
    if max_doc_count < 1:
        raise ValueError("rare_terms_agg: max_doc_count must be >= 1")
    matched = _matched_docids(spark, index_dir, query, cfg)
    fwd = tbl.read(spark, index_dir, "forward").select("docid", field)
    if matched is None:
        return fwd.limit(0).select(field).withColumn("n_docs", F.lit(0).cast("long"))
    return (
        matched.join(fwd, "docid", "inner")
        .filter(F.col(field).isNotNull())
        .groupBy(field)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") <= max_doc_count)
        .orderBy(F.asc("n_docs"), F.asc(field))
    )


def adjacency_matrix_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    filters: dict[str, str],
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: named predicate buckets plus
    one bucket per PAIRWISE intersection, keyed "a&b" in name-sorted order
    — co-occurrence counts for graph-style dashboards. Zero-count buckets
    are DROPPED (unlike range/filters, the ES adjacency_matrix omits empty
    intersections). Still one conditional-count pass over the matched set:
    singles and pairs are all conditional sums in a single agg row."""
    cfg = effective_config(spark, index_dir, cfg)
    if not filters:
        raise ValueError("adjacency_matrix_agg needs at least one named filter")
    names = sorted(filters)
    labels: list[tuple[str, F.Column]] = [(n, F.expr(filters[n])) for n in names]
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            labels.append((f"{a}&{b}", F.expr(filters[a]) & F.expr(filters[b])))
    empty = tbl.local_rows_df(spark, [], "bucket string, n_docs long")
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return empty
    fwd = tbl.read(spark, index_dir, "forward")
    m = matched.join(fwd, "docid", "inner")
    aggs = [
        F.coalesce(F.sum(F.when(cond, 1)), F.lit(0)).cast("long").alias(f"b{i}")
        for i, (_, cond) in enumerate(labels)
    ]
    row = m.agg(*aggs)
    pairs = ", ".join(f"'{name}', `b{i}`" for i, (name, _) in enumerate(labels))
    return (
        row.selectExpr(f"stack({len(labels)}, {pairs}) AS (bucket, n_docs)")
        .filter(F.col("n_docs") > 0)
        .orderBy("bucket")
    )


def weighted_avg_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``weighted_avg`` aggregation, index-native: the mean analyzed
    doc length weighted by each matching doc's total query-term frequency
    (value = dl, weight = Σ tf over the query's terms — docs that match
    the query harder count more). One postings decode (tf and dl ride in
    the same payload — no forward join at all), one global agg row:
    ``weighted_avg_dl`` (6 dp), ``n_docs``, ``sum_weight``."""
    from .query import _decode_tf_dl

    cfg = effective_config(spark, index_dir, cfg)
    schema = "weighted_avg_dl double, n_docs long, sum_weight long"
    terms = query_terms(query)
    if not terms:
        return tbl.local_rows_df(spark, [], schema)
    stats = corpus_stats(spark, index_dir)
    idf, buckets = term_meta(spark, index_dir, terms, stats["n_docs"], cfg)
    terms = [t for t in terms if t in idf]
    if not terms:
        return tbl.local_rows_df(spark, [], schema)
    blocks = _matching_blocks(spark, index_dir, terms, buckets)
    per_doc = (
        _mask_deleted(_decode_tf_dl(blocks), deleted_docids(spark, index_dir))
        .groupBy("docid")
        .agg(F.sum("tf").alias("w"), F.first("dl").alias("dl"))
    )
    return per_doc.agg(
        F.round(F.sum(F.col("w") * F.col("dl")) / F.sum("w"), 6).alias("weighted_avg_dl"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("sum_weight"),
    )


def diversified_sampler_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    diversify_on: str,
    agg_on: str,
    shard_size: int = 100,
    max_docs_per_value: int = 3,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``diversified_sampler`` + sub-agg: cap the matched set at
    ``max_docs_per_value`` docs per ``diversify_on`` value, keep the first
    ``shard_size`` of the capped set, then run a terms agg on ``agg_on``
    over the sample — de-biasing facets from one dominant key. ES samples
    best-scored-first per shard; this deterministic re-expression takes
    document order (conv_id, turn_idx — the user-visible key, stable on
    any cluster size or bucket layout), so reruns and resizes sample
    identically. Both caps are window row_numbers over bucket-pruned
    matched docids — no global sort of doc rows, and the sample (≤
    shard_size rows) is the only thing the final agg sees."""
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [], f"{agg_on} string, n_docs long")
    fwd = tbl.read(spark, index_dir, "forward").select(
        "docid", "conv_id", "turn_idx", diversify_on, agg_on
    )
    m = matched.join(fwd, "docid", "inner").filter(F.col(diversify_on).isNotNull())
    per_val = W.partitionBy(diversify_on).orderBy("conv_id", "turn_idx")
    sample = (
        m.withColumn("__rn", F.row_number().over(per_val))
        .filter(F.col("__rn") <= max_docs_per_value)
        .orderBy("conv_id", "turn_idx")
        .limit(shard_size)
    )
    # the cap applies to the SAMPLE (ES: sampler selects docs first); the
    # sub-agg then drops docs missing its key, like any terms agg
    return (
        sample.filter(F.col(agg_on).isNotNull())
        .groupBy(agg_on)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.asc(agg_on))
    )


def bucket_sort_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    interval: str = "day",
    sort_on: str = "n_docs",
    ascending: bool = False,
    size: int = 5,
    offset: int = 0,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``bucket_sort`` pipeline agg: re-order the parent
    date_histogram's buckets by a bucket value (tie: period asc) and
    truncate to [offset, offset+size) — "top N busiest days". Runs on the
    post-reduce bucket stream (∝ time range), never on doc rows."""
    hist = date_histogram(spark, index_dir, query, interval, cfg)
    key = F.col(sort_on).asc() if ascending else F.col(sort_on).desc()
    w = W.orderBy(key, F.col("period").asc())
    return (
        hist.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + size))
        .drop("__rn")
        .orderBy(key, F.col("period").asc())
    )


def serial_diff_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    interval: str = "day",
    lag: int = 1,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``serial_diff`` pipeline agg: ``n_docs - n_docs[t-lag]`` over the
    date_histogram bucket stream (lag=7 = week-over-week seasonality
    strip). Null while the lag window is unfilled, exactly like ES, which
    emits nothing for the first ``lag`` buckets."""
    if lag < 1:
        raise ValueError(f"serial_diff_agg: lag must be >= 1, got {lag}")
    hist = date_histogram(spark, index_dir, query, interval, cfg)
    w = W.orderBy("period")
    return hist.select(
        "period",
        "n_docs",
        (F.col("n_docs") - F.lag("n_docs", lag).over(w)).alias("diff"),
    ).orderBy("period")


def stats_bucket_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    interval: str = "day",
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES sibling pipeline aggs — ``avg_bucket`` / ``min_bucket`` /
    ``max_bucket`` / ``sum_bucket`` / ``stats_bucket`` — in one row over
    the parent date_histogram's ``n_docs`` stream: the cross-bucket
    moments dashboards pin next to the series. Min/max carry WHICH bucket
    (ES's min/max_bucket report keys): the first period hitting the
    extreme."""
    hist = date_histogram(spark, index_dir, query, interval, cfg)
    return hist.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.round(F.avg("n_docs"), 6).alias("avg_docs"),
        F.min("n_docs").alias("min_docs"),
        F.max("n_docs").alias("max_docs"),
        F.sum("n_docs").alias("sum_docs"),
        # min_by on a struct orders lexicographically: (n_docs, period) asc
        # = rarest bucket, earliest period on ties; negating n_docs flips
        # the first key only, keeping the earliest-period tiebreak
        F.min_by("period", F.struct(F.col("n_docs").alias("k"), F.col("period").alias("p"))).alias(
            "min_period"
        ),
        F.min_by(
            "period", F.struct((-F.col("n_docs")).alias("k"), F.col("period").alias("p"))
        ).alias("max_period"),
    )


def global_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``global`` bucket: corpus-wide metrics alongside the query-scoped
    bucket in ONE response — the "matched vs everything" comparison a
    search UI shows next to facets. One row: (n_matched, avg_dl_matched,
    n_total, avg_dl_total) over live docs; an empty/unknown query yields
    n_matched = 0 with null matched average (ES: empty query bucket).

    Scale shape: the matched side is the presence-only postings decode +
    one doc_lens join; the global side is a metadata-cheap doc_lens scan.
    Both reduce to single-row aggregates before the final 1×1 cross join —
    nothing driver-side, no full-table shuffle.
    """
    cfg = effective_config(spark, index_dir, cfg)
    dls = _mask_deleted(
        tbl.read(spark, index_dir, "doc_lens").select("docid", "dl"),
        deleted_docids(spark, index_dir),
    )
    total = dls.agg(
        F.count(F.lit(1)).alias("n_total"), F.avg("dl").alias("avg_dl_total")
    )
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        m = tbl.local_rows_df(
            spark, [(0, None)], "n_matched long, avg_dl_matched double"
        )
    else:
        m = dls.join(matched, "docid", "inner").agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.avg("dl").alias("avg_dl_matched"),
        )
    return m.crossJoin(total).select(
        "n_matched", "avg_dl_matched", "n_total", "avg_dl_total"
    )


def missing_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    field: str,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``missing`` agg: how many matched docs lack ``field`` (null in
    the forward table) — the bucket ES pairs with a terms facet so the
    "no value" slice is visible. One row: (n_missing, n_matched).

    Scale shape: matched docids join a two-column forward scan; one
    conditional-count hash agg, map-side combined.
    """
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [(0, 0)], "n_missing long, n_matched long")
    fwd = tbl.read(spark, index_dir, "forward").select("docid", field)
    return (
        matched.join(fwd, "docid", "inner")
        .agg(
            F.sum(F.when(F.col(field).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )


def percentile_ranks(
    spark: SparkSession,
    index_dir: str,
    query: str,
    values: list[float],
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``percentile_ranks`` over the matched docs' analyzed length:
    for each requested value, the percentage of matched docs at or below
    it (exact, not the TDigest approximation — this engine's percentiles
    agg documents the same choice). One conditional-count hash agg; the
    requested values ride along as literals, so a 50-value request is
    still a single pass.
    """
    cfg = effective_config(spark, index_dir, cfg)
    vals = [float(v) for v in values]
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None or not vals:
        return tbl.local_rows_df(spark, [], "value double, pct double")
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    row = matched.join(dls, "docid", "inner").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.when(F.col("dl") <= v, 1).otherwise(0)).alias(f"c{i}")
            for i, v in enumerate(vals)
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(v).alias("value"),
                (F.col(f"c{i}") * 100.0 / F.col("n")).alias("pct"),
            )
            for i, v in enumerate(vals)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("z"))
        .select(F.col("z.value").alias("value"), F.col("z.pct").alias("pct"))
        .orderBy("value")
    )


def top_metrics(
    spark: SparkSession,
    index_dir: str,
    query: str,
    sort_col: str = "ts",
    metric_cols: tuple[str, ...] = ("dl",),
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``top_metrics``: the metric values of the single matched doc
    ranked first by ``sort_col`` descending (docid asc tiebreak, so the
    answer is deterministic). One row: (sort value, *metrics, docid).

    Scale shape: matched docids join the column-pruned forward/doc_lens
    scan, then one TakeOrdered(1) — no window function, no full sort.
    """
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    need_dl = "dl" in metric_cols
    fwd_cols = [c for c in {sort_col, *metric_cols} if c != "dl"]
    schema = (
        f"{sort_col} string, "
        + ", ".join(f"{c} string" for c in metric_cols)
        + ", docid long"
    )
    if matched is None:
        return tbl.local_rows_df(spark, [], schema)
    out = matched
    if fwd_cols:
        fwd = tbl.read(spark, index_dir, "forward").select("docid", *fwd_cols)
        out = out.join(fwd, "docid", "inner")
    if need_dl:
        dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
        out = out.join(dls, "docid", "inner")
    return (
        out.orderBy(F.col(sort_col).desc(), F.col("docid").asc())
        .limit(1)
        .select(sort_col, *metric_cols, "docid")
    )


def value_count(
    spark: SparkSession,
    index_dir: str,
    query: str,
    field: str,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``value_count``: how many matched docs carry a non-null value
    of a forward field (single-valued fields here, so docs == values).
    One conditional count over the docid ⋈ column-pruned forward scan —
    the cheapest possible metric agg, and the one every dashboard pairs
    with ``avg`` to expose missing-data skew."""
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [(field, 0)], "field string, n_values long")
    fwd = tbl.read(spark, index_dir, "forward").select("docid", field)
    return (
        matched.join(fwd, "docid", "inner")
        .agg(F.count(field).alias("n_values"))
        .select(F.lit(field).alias("field"), "n_values")
    )


def median_absolute_deviation(
    spark: SparkSession,
    index_dir: str,
    query: str,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``median_absolute_deviation`` over the matched docs' analyzed
    length: ``median(|dl - median(dl)|)``. ES approximates with TDigest;
    this engine computes the exact value (the same determinism choice the
    percentiles agg documents). Two aggregation passes — the inner median
    is a one-row frame crossed back in (broadcast NL join of a scalar),
    never a driver collect."""
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [], "mad double")
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    m = matched.join(dls, "docid", "inner")
    med = m.agg(F.percentile("dl", F.lit(0.5)).alias("med"))
    return (
        m.crossJoin(F.broadcast(med))
        .agg(F.percentile(F.abs(F.col("dl") - F.col("med")), F.lit(0.5)).alias("mad"))
    )


def boxplot_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``boxplot`` agg over the matched docs' analyzed length:
    min / q1 / q2 / q3 / max in one hash-agg pass (quartiles linearly
    interpolated, exact — matching this engine's percentiles contract)."""
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(
            spark, [], "min_dl long, q1 double, q2 double, q3 double, max_dl long"
        )
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    row = matched.join(dls, "docid", "inner").agg(
        F.min("dl").cast("long").alias("min_dl"),
        F.percentile("dl", F.lit([0.25, 0.5, 0.75])).alias("qs"),
        F.max("dl").cast("long").alias("max_dl"),
    )
    return row.select(
        "min_dl",
        F.col("qs")[0].alias("q1"),
        F.col("qs")[1].alias("q2"),
        F.col("qs")[2].alias("q3"),
        "max_dl",
    )


def string_stats(
    spark: SparkSession,
    index_dir: str,
    query: str,
    field: str = "text",
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``string_stats`` over a forward text field of the matched docs:
    value count, min/max/avg character length, and the Shannon entropy
    (bits) of the field's pooled character distribution — ES's exact
    definition (all values concatenated, probability per character).

    Scale shape: the length stats are one hash agg over the docid ⋈
    column-pruned forward join. The entropy pass explodes characters —
    rows ∝ total characters of MATCHED docs only — but the immediate
    map-side partial agg collapses them to ≤ |alphabet| keys per task, so
    what crosses the shuffle is a few hundred (char, count) pairs per
    partition, then a second one-row agg computes −Σ p·log2 p."""
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(
            spark,
            [],
            "n_values long, min_len int, max_len int, avg_len double, entropy double",
        )
    fwd = tbl.read(spark, index_dir, "forward").select("docid", field)
    m = matched.join(fwd, "docid", "inner").where(F.col(field).isNotNull())
    lens = m.agg(
        F.count(field).alias("n_values"),
        F.min(F.length(field)).alias("min_len"),
        F.max(F.length(field)).alias("max_len"),
        F.avg(F.length(field)).alias("avg_len"),
    )
    chars = (
        m.select(F.explode(F.split(F.col(field), "")).alias("ch"))
        .where(F.col("ch") != "")
        .groupBy("ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # H = -Σ p·log2 p = log2(T) - (Σ c·log2 c)/T — one agg pass, no window
    ent = chars.agg(
        (
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
        ).alias("entropy")
    )
    return lens.crossJoin(F.broadcast(ent))


def sampler_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    shard_size: int = 100,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``sampler`` agg: restrict sub-aggregations to the best-scoring
    ``shard_size`` matches (ES samples per shard; a single logical sample
    here, deterministic via the engine-wide (score desc, docid asc)
    tie-break). Sub-agg = extended length stats over the sample — the
    canonical "profile the head of the result set cheaply" shape.

    Plan: one BM25 top-``shard_size`` (block-max pruned like any other
    top-k) feeding a single hash agg; the sample, not the corpus, crosses
    the second stage."""
    from .query import bm25_topk

    top = bm25_topk(spark, index_dir, query, k=int(shard_size), cfg=cfg)
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    return top.join(dls, "docid", "inner").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("dl").cast("long").alias("min_dl"),
        F.max("dl").cast("long").alias("max_dl"),
        F.avg("dl").alias("avg_dl"),
    )


def percentiles_bucket_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    interval: str = "day",
    percents: tuple[float, ...] = (25.0, 50.0, 75.0),
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``percentiles_bucket`` sibling pipeline agg: percentiles of the
    parent date_histogram's ``n_docs`` bucket stream (exact,
    linearly interpolated — this engine's percentiles contract; ES itself
    is exact here too, since pipeline aggs see the reduced bucket list).
    One row per requested percent: (pct, value).

    Scale shape: the parent histogram is the distributed matched ⋈
    forward agg; this pass aggregates its OUTPUT — cardinality ∝ bucket
    count, never corpus size — into a single row, then explodes to
    (pct, value) rows."""
    pcts = [float(p) for p in percents]
    if not pcts or any(not (0.0 <= p <= 100.0) for p in pcts):
        raise ValueError(f"percentiles_bucket_agg: bad percents {percents!r}")
    hist = date_histogram(spark, index_dir, query, interval, cfg)
    row = hist.agg(
        F.percentile("n_docs", F.lit([p / 100.0 for p in pcts])).alias("qs")
    )
    z = row.select(
        F.explode(
            F.arrays_zip(F.lit(pcts).alias("pct"), F.col("qs").alias("value"))
        ).alias("z")
    )
    return z.select(F.col("z.pct").alias("pct"), F.col("z.value").alias("value"))


def normalize_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    interval: str = "day",
    method: str = "percent_of_sum",
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``normalize`` pipeline agg: rescale the parent date_histogram's
    ``n_docs`` per bucket. Methods (the ES set): ``percent_of_sum``
    (v/Σv · 100), ``rescale_0_1``, ``rescale_0_100``, ``mean``
    ((v-avg)/(max-min)), ``z-score`` ((v-avg)/σ_pop), ``softmax``
    (computed stably as exp(v-max)/Σexp(v-max), mathematically identical
    to ES's plain softmax without overflowing on large counts).

    The cross-bucket stats come from a one-row agg broadcast back over
    the bucket stream — no window, no driver round-trip."""
    hist = date_histogram(spark, index_dir, query, interval, cfg)
    stats = hist.agg(
        F.sum("n_docs").alias("_sum"),
        F.min("n_docs").alias("_min"),
        F.max("n_docs").alias("_max"),
        F.avg("n_docs").alias("_avg"),
        F.stddev_pop("n_docs").alias("_std"),
    )
    j = hist.crossJoin(F.broadcast(stats))
    v = F.col("n_docs").cast("double")
    # spread-normalized methods use try_divide: a single-bucket / zero-
    # spread stream yields null (the analog of ES's Java NaN there)
    if method == "percent_of_sum":
        val = v / F.col("_sum") * 100.0
    elif method == "rescale_0_1":
        val = F.try_divide(v - F.col("_min"), F.col("_max") - F.col("_min"))
    elif method == "rescale_0_100":
        val = F.try_divide(v - F.col("_min"), F.col("_max") - F.col("_min")) * 100.0
    elif method == "mean":
        val = F.try_divide(v - F.col("_avg"), F.col("_max") - F.col("_min"))
    elif method == "z-score":
        val = F.try_divide(v - F.col("_avg"), F.col("_std"))
    elif method == "softmax":
        num = F.exp(v - F.col("_max"))
        den = F.sum(F.exp(v - F.col("_max"))).over(W.partitionBy())
        val = num / den
    else:
        raise ValueError(f"normalize_agg: unknown method {method!r}")
    return j.select("period", "n_docs", val.alias("value")).orderBy("period")


def cumulative_cardinality_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    field: str = "tool",
    interval: str = "day",
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``cumulative_cardinality`` pipeline agg: per date bucket, how
    many DISTINCT values of ``field`` have been seen in matched docs up
    to and including that bucket (the "new users over time" panel).
    Missing (null) values are skipped, like the cardinality agg.

    Scale shape: ES computes this by merging per-bucket HLL sketches in
    bucket order; the exact distributed realization here is
    first-occurrence assignment — min(period) per value (one hash agg,
    keyed by the value, never the corpus), new-value counts per bucket,
    then a cumulative sum over the bucket stream (single-partition window
    over ∝ time-range rows, the one place that's scale-safe). Buckets
    with matches but no new values still appear, carrying the running
    total forward."""
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(
            spark, [], "period string, n_docs long, cum_unique long"
        )
    fwd = tbl.read(spark, index_dir, "forward").select("docid", field, "ts")
    m = matched.join(fwd, "docid", "inner").withColumn(
        "period", _period_col(interval)
    )
    hist = m.groupBy("period").agg(F.count(F.lit(1)).alias("n_docs"))
    firsts = (
        m.where(F.col(field).isNotNull())
        .groupBy(field)
        .agg(F.min("period").alias("period"))
        .groupBy("period")
        .agg(F.count(F.lit(1)).alias("new_values"))
    )
    w = W.orderBy("period")
    return (
        hist.join(firsts, "period", "left")
        .select(
            "period",
            "n_docs",
            F.sum(F.coalesce(F.col("new_values"), F.lit(0))).over(w).alias("cum_unique"),
        )
        .orderBy("period")
    )


def matrix_stats_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``matrix_stats`` over two numeric per-doc fields of the matched
    set — x = analyzed length (dl), y = raw character length: per-field
    count/mean/variance/skewness/kurtosis plus the cross-field covariance
    and Pearson correlation.

    All moments are POPULATION moments computed from power sums in ONE
    hash-agg pass (n, Σx, Σx², Σx³, Σx⁴, Σy…, Σxy) — the same
    map-side-combining shape as extended_stats, engine-portable because
    the formulas are explicit rather than delegated to library
    skewness/kurtosis (whose sample-vs-population conventions differ
    between engines). Kurtosis is plain m4/m2² (not excess)."""
    cfg = effective_config(spark, index_dir, cfg)
    schema = (
        "n long, mean_x double, var_x double, skew_x double, kurt_x double, "
        "mean_y double, var_y double, skew_y double, kurt_y double, "
        "cov_xy double, corr_xy double"
    )
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [], schema)
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    fwd = tbl.read(spark, index_dir, "forward").select(
        "docid", F.length("text").alias("ylen")
    )
    m = (
        matched.join(dls, "docid", "inner")
        .join(fwd, "docid", "inner")
        .select(F.col("dl").cast("double").alias("x"), F.col("ylen").cast("double").alias("y"))
    )
    sums = m.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.pow(c, p)).alias(f"s{c}{p}")
            for c in ("x", "y")
            for p in (1, 2, 3, 4)
        ],
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )

    def moments(c):
        n = F.col("n").cast("double")
        mu = F.col(f"s{c}1") / n
        m2 = F.col(f"s{c}2") / n - mu * mu
        m3 = F.col(f"s{c}3") / n - 3 * mu * F.col(f"s{c}2") / n + 2 * mu * mu * mu
        m4 = (
            F.col(f"s{c}4") / n
            - 4 * mu * F.col(f"s{c}3") / n
            + 6 * mu * mu * F.col(f"s{c}2") / n
            - 3 * mu * mu * mu * mu
        )
        return mu, m2, F.try_divide(m3, F.pow(m2, 1.5)), F.try_divide(m4, m2 * m2)

    mux, varx, skx, kux = moments("x")
    muy, vary, sky, kuy = moments("y")
    n = F.col("n").cast("double")
    cov = F.col("sxy") / n - mux * muy
    corr = F.try_divide(cov, F.sqrt(varx * vary))
    return sums.select(
        F.col("n").cast("long").alias("n"),
        mux.alias("mean_x"), varx.alias("var_x"),
        skx.alias("skew_x"), kux.alias("kurt_x"),
        muy.alias("mean_y"), vary.alias("var_y"),
        sky.alias("skew_y"), kuy.alias("kurt_y"),
        cov.alias("cov_xy"), corr.alias("corr_xy"),
    )


def t_test_agg(
    spark: SparkSession,
    index_dir: str,
    query_a: str,
    query_b: str,
    mode: str = "heteroscedastic",
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``t_test`` between the analyzed lengths of two queries' matched
    sets: Student's t statistic, ``heteroscedastic`` (Welch, the ES
    default — Welch–Satterthwaite df) or ``homoscedastic`` (pooled
    variance, df = nₐ+n_b-2). Sample (n-1) variances, as the test
    demands. Returns one row (n_a, n_b, t, df).

    Scale shape: each side is the usual presence-only postings decode ⋈
    doc_lens reduced to a single (n, Σx, Σx²) row; the t math happens on
    the 1×1 cross join. Docs matching both queries land in both groups
    (unpaired test, like ES's field-level t_test on filtered aggs)."""
    if mode not in ("heteroscedastic", "homoscedastic"):
        raise ValueError(f"t_test_agg: unknown mode {mode!r}")
    cfg = effective_config(spark, index_dir, cfg)
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")

    def side(q, tag):
        matched = _matched_docids(spark, index_dir, q, cfg)
        if matched is None:
            return tbl.local_rows_df(
                spark, [(0, None, None)], f"n_{tag} long, mean_{tag} double, var_{tag} double"
            )
        return matched.join(dls, "docid", "inner").agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.avg("dl").alias(f"mean_{tag}"),
            F.var_samp("dl").alias(f"var_{tag}"),
        )

    j = side(query_a, "a").crossJoin(F.broadcast(side(query_b, "b")))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    va, vb = F.col("var_a"), F.col("var_b")
    diff = F.col("mean_a") - F.col("mean_b")
    if mode == "heteroscedastic":
        se2 = va / na + vb / nb
        t = F.try_divide(diff, F.sqrt(se2))
        df = F.try_divide(
            se2 * se2,
            F.pow(va / na, 2) / (na - 1) + F.pow(vb / nb, 2) / (nb - 1),
        )
    else:
        sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
        t = F.try_divide(diff, F.sqrt(sp2 * (1 / na + 1 / nb)))
        df = na + nb - 2
    return j.select("n_a", "n_b", t.alias("t"), df.alias("df"))


_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def rate_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    interval: str = "day",
    unit: str = "hour",
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``rate`` agg inside a date_histogram: each bucket's doc count
    converted to a per-``unit`` rate. Fixed-length buckets divide by the
    constant ratio; calendar buckets (month/quarter/year) divide by that
    bucket's ACTUAL length in days (ES's calendar-aware contract — a
    February rate uses 28 days). Pure arithmetic over the histogram's
    output — no second scan."""
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"rate_agg: unsupported unit {unit!r}")
    hist = date_histogram(spark, index_dir, query, interval, cfg)
    usec = float(_UNIT_SECONDS[unit])
    if interval in _UNIT_SECONDS:
        bucket_sec = F.lit(float(_UNIT_SECONDS[interval]))
    elif interval in ("month", "quarter", "year"):
        start = F.to_date("period")
        nxt = F.add_months(start, {"month": 1, "quarter": 3, "year": 12}[interval])
        bucket_sec = F.date_diff(nxt, start).cast("double") * 86400.0
    else:
        raise ValueError(f"rate_agg: unsupported interval {interval!r}")
    return hist.select(
        "period",
        "n_docs",
        (F.col("n_docs") * F.lit(usec) / bucket_sec).alias("rate"),
    ).orderBy("period")


_AUTO_LADDER = ("second", "minute", "hour", "day", "week", "month", "quarter", "year")


def _bucket_count(lo, hi, interval: str) -> int:
    """Exact calendar bucket count covering [lo, hi] at ``interval``
    (distinct date_trunc values — ISO Monday weeks, like Spark)."""
    import datetime as _dt

    if interval in _UNIT_SECONDS:
        if interval == "week":
            mon_lo = lo.date() - _dt.timedelta(days=lo.weekday())
            mon_hi = hi.date() - _dt.timedelta(days=hi.weekday())
            return (mon_hi - mon_lo).days // 7 + 1
        sec = _UNIT_SECONDS[interval]
        e_lo = int(lo.timestamp()) // sec
        e_hi = int(hi.timestamp()) // sec
        return e_hi - e_lo + 1
    if interval == "month":
        return (hi.year * 12 + hi.month) - (lo.year * 12 + lo.month) + 1
    if interval == "quarter":
        return (hi.year * 4 + (hi.month - 1) // 3) - (lo.year * 4 + (lo.month - 1) // 3) + 1
    if interval == "year":
        return hi.year - lo.year + 1
    raise ValueError(f"unknown interval {interval!r}")


def auto_date_histogram(
    spark: SparkSession,
    index_dir: str,
    query: str,
    target_buckets: int = 10,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``auto_date_histogram``: pick the finest calendar interval whose
    bucket count over the matched span stays ≤ ``target_buckets``, then
    run the normal date_histogram at it. The ladder here is the calendar
    units (second…year) without ES's sub-unit multiples (5s/30m/3h…) — a
    documented simplification; the contract (finest resolution within
    the budget, never more than target buckets unless even yearly
    overflows) is the same. Returns (interval, period, n_docs).

    Scale shape: the interval choice needs only the matched span —
    min/max ts reduced to ONE driver row (the same cost class as the
    corpus-stats read every query does) — never a trial aggregation per
    ladder step; then one ordinary distributed histogram pass."""
    if target_buckets < 1:
        raise ValueError(f"auto_date_histogram: target_buckets must be >= 1")
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(
            spark, [], "interval string, period string, n_docs long"
        )
    fwd = tbl.read(spark, index_dir, "forward").select("docid", "ts")
    span = (
        matched.join(fwd, "docid", "inner")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    if span.lo is None:
        return tbl.local_rows_df(
            spark, [], "interval string, period string, n_docs long"
        )
    chosen = _AUTO_LADDER[-1]
    for iv in _AUTO_LADDER:
        if _bucket_count(span.lo, span.hi, iv) <= target_buckets:
            chosen = iv
            break
    hist = date_histogram(spark, index_dir, query, chosen, cfg)
    return hist.select(F.lit(chosen).alias("interval"), "period", "n_docs")


_COMBINES = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "count": lambda c: F.count(c),
}


def scripted_metric_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    map_sql: str,
    combine: str = "sum",
    finalize_sql: str | None = None,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``scripted_metric`` in its distributable (algebraic) form:
    ``map_sql`` is evaluated per matched doc over the forward columns +
    ``dl``, ``combine`` reduces the mapped values (sum/min/max/avg/count
    — the commutative monoids a correct ES map/combine/reduce script must
    implement anyway to be shard-safe), and ``finalize_sql`` (optional,
    over the one-row column ``value``) post-processes the reduced value —
    ES's reduce_script analog. Arbitrary stateful scripts are
    deliberately out of scope: they cannot be map-side combined and are
    exactly what this engine's UDF policy avoids in hot paths.

    Plan: docid ⋈ column-pruned forward/doc_lens scan → one
    whole-stage-codegen projection → one hash agg. Returns (value)."""
    if combine not in _COMBINES:
        raise ValueError(f"scripted_metric_agg: unknown combine {combine!r}")
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [], "value double")
    fwd = tbl.read(spark, index_dir, "forward")
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    m = matched.join(fwd, "docid", "inner").join(dls, "docid", "inner")
    mapped = m.select(F.expr(map_sql).cast("double").alias("v"))
    out = mapped.agg(_COMBINES[combine]("v").cast("double").alias("value"))
    if finalize_sql is not None:
        out = out.select(F.expr(finalize_sql).cast("double").alias("value"))
    return out


def moving_percentiles_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    interval: str = "day",
    window: int = 3,
    pct: float = 50.0,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``moving_percentiles`` pipeline agg: the ``pct`` percentile of
    the trailing ``window`` buckets' ``n_docs`` (window INCLUDES the
    current bucket — ES's shift=0 frame for moving_percentiles), exact
    linear interpolation where ES merges TDigests. Null until the frame
    has at least one bucket (always true), so every bucket emits.

    Same single-partition bucket-stream window as the other pipeline
    aggs — input cardinality ∝ time range, never corpus size."""
    if window < 1:
        raise ValueError(f"moving_percentiles_agg: window must be >= 1")
    if not (0.0 <= pct <= 100.0):
        raise ValueError(f"moving_percentiles_agg: bad pct {pct}")
    hist = date_histogram(spark, index_dir, query, interval, cfg)
    w = W.orderBy("period").rowsBetween(-(window - 1), 0)
    return hist.select(
        "period",
        "n_docs",
        F.percentile("n_docs", F.lit(pct / 100.0)).over(w).alias("moving_pct"),
    ).orderBy("period")


def significant_text(
    spark: SparkSession,
    index_dir: str,
    query: str,
    size: int = 10,
    min_doc_count: int = 3,
    filter_duplicate_text: bool = True,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``significant_text``: significant_terms re-analyzed from the
    matched docs' raw text with ``filter_duplicate_text`` ON by default —
    the agg ES built specifically so copypasta/boilerplate can't dominate
    the significance ranking. Same JLH scoring and two-narrow-shuffle
    plan; the dedup adds one fingerprint window keyed by fp."""
    return significant_terms(
        spark, index_dir, query, size=size, min_doc_count=min_doc_count,
        cfg=cfg, filter_duplicate_text=filter_duplicate_text,
    )


def categorize_text(
    spark: SparkSession,
    index_dir: str,
    query: str,
    field: str = "text",
    max_tokens: int = 4,
    size: int = 10,
    min_doc_count: int = 1,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``categorize_text``: group the matched docs' semi-structured
    text into message categories. ES's categorizer drafts a token pattern
    by dropping the tokens its ml_standard tokenizer flags as variable
    (numbers, hex ids, paths); the deterministic engine analog keeps the
    first ``max_tokens`` letter-only lowercase tokens as the category key
    (digit-bearing tokens are the variable parts of log/transcript lines
    — ids, counts, timestamps — exactly what ES's categorizer masks out).
    Docs whose text yields no stable token fall into no category, as in
    ES. Returns (category, doc_count), doc_count desc / category asc,
    top ``size`` buckets with >= ``min_doc_count`` docs.

    Scale shape: the key is one JVM expression chain (split/filter/slice)
    over the column-pruned forward join — no token explode, no Python.
    The groupBy shuffles only (category, partial count) pairs: map-side
    combine collapses each task to its distinct categories, and category
    cardinality is ~template-count, not doc-count."""
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    out_schema = "category string, doc_count long"
    if matched is None:
        return tbl.local_rows_df(spark, [], out_schema)
    fwd = tbl.read(spark, index_dir, "forward").select("docid", field)
    toks = F.split(F.lower(F.col(field)), "[^0-9a-z]+")
    stable = F.filter(toks, lambda x: (x != "") & (~x.rlike("[0-9]")))
    key = F.array_join(F.slice(stable, 1, max_tokens), " ")
    return (
        matched.join(fwd, "docid", "inner")
        .select(key.alias("category"))
        .where(F.col("category") != "")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .where(F.col("doc_count") >= int(min_doc_count))
        .orderBy(F.col("doc_count").desc(), F.col("category").asc())
        .limit(size)
    )


def frequent_item_sets_df(
    df: DataFrame,
    txn_col: str,
    item_col: str,
    max_set_size: int = 2,
    min_support: float = 0.1,
    size: int = 10,
) -> DataFrame:
    """ES ``frequent_item_sets`` (8.4+ market-basket analysis) over an
    arbitrary frame: transactions are the distinct ``txn_col`` values,
    items the distinct ``item_col`` values seen in each. Emits itemsets of
    size 1..``max_set_size`` (1 or 2 — ES's own mining is eclat-bounded;
    higher orders explode combinatorially and are out of scope here) with
    ``support`` = fraction of transactions containing the whole set, kept
    when >= ``min_support``, ranked support desc / itemset asc. The
    itemset renders as a space-joined sorted string so results are
    engine-portable.

    Scale shape: one distinct (txn, item) shuffle; singles are a hash agg
    over it; pairs are a self equi-join on txn — fan-out bounded by
    (items-per-transaction choose 2), which for categorical fields is
    tiny and independent of corpus size. Support counts shuffle only
    (itemset, partial count) pairs. The transaction count is the only
    driver-side scalar."""
    if not 1 <= int(max_set_size) <= 2:
        raise ValueError("frequent_item_sets: max_set_size must be 1 or 2")
    if not 0.0 < float(min_support) <= 1.0:
        raise ValueError("frequent_item_sets: min_support must be in (0, 1]")
    t = (
        df.where(F.col(item_col).isNotNull())
        .select(F.col(txn_col).alias("txn"), F.col(item_col).cast("string").alias("item"))
        .distinct()
        .persist()
    )
    try:
        n_txn = t.select("txn").distinct().count()
        if n_txn == 0:
            return tbl.local_rows_df(
                df.sparkSession, [],
                "itemset string, set_size int, doc_count long, support double",
            )
        sets = t.groupBy(F.col("item").alias("itemset")).agg(
            F.count(F.lit(1)).alias("doc_count")
        ).withColumn("set_size", F.lit(1))
        if max_set_size >= 2:
            a, b = t.alias("a"), t.alias("b")
            pairs = (
                a.join(b, (F.col("a.txn") == F.col("b.txn")) & (F.col("a.item") < F.col("b.item")))
                .select(F.concat_ws(" ", F.col("a.item"), F.col("b.item")).alias("itemset"))
                .groupBy("itemset")
                .agg(F.count(F.lit(1)).alias("doc_count"))
                .withColumn("set_size", F.lit(2))
            )
            sets = sets.unionByName(pairs)
        out = (
            sets.withColumn("support", F.round(F.col("doc_count") / F.lit(float(n_txn)), 4))
            .where(F.col("doc_count") / F.lit(float(n_txn)) >= float(min_support))
            .select("itemset", "set_size", "doc_count", "support")
            .orderBy(F.col("doc_count").desc(), F.col("itemset").asc())
            .limit(size)
        )
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        t.unpersist()


def frequent_item_sets(
    spark: SparkSession,
    index_dir: str,
    query: str,
    item_field: str = "tool",
    txn_field: str = "conv_id",
    max_set_size: int = 2,
    min_support: float = 0.1,
    size: int = 10,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``frequent_item_sets`` over the index: transactions are the
    matched docs' ``txn_field`` groups (conversations by default), items
    their distinct ``item_field`` values (tools used). See
    :func:`frequent_item_sets_df` for semantics and scale shape."""
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    empty_schema = "itemset string, set_size int, doc_count long, support double"
    if matched is None:
        return tbl.local_rows_df(spark, [], empty_schema)
    fwd = tbl.read(spark, index_dir, "forward").select("docid", txn_field, item_field)
    return frequent_item_sets_df(
        matched.join(fwd, "docid", "inner"),
        txn_field, item_field, max_set_size, min_support, size,
    )


def random_sampler_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    probability: float = 0.3,
    seed: str = "rs",
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``random_sampler`` agg: run the sub-aggregation on a random
    ``probability`` fraction of the matched docs and report the
    background-scaled doc count (ES divides the sampled count by p).
    Sub-agg = analyzed-length stats, like :func:`sampler_agg`, so the
    two are directly comparable (best-k sample vs uniform sample).

    ES samples with a per-shard RNG; here the draw is derandomized
    through the engine-portable md5 contract on the external key
    (``seed``‖conv_id), so the same docs are sampled on every engine, at
    every scale, under any partitioning — and the sample is a pushed-
    down filter on the matched ⋈ forward join, never a corpus pass.
    One row: (n_sampled, doc_count, avg_dl).
    """
    if not (0.0 < probability <= 1.0):
        raise ValueError(f"probability must be in (0, 1], got {probability}")
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(
            spark, [], "n_sampled long, doc_count long, avg_dl double"
        )
    fwd = tbl.read(spark, index_dir, "forward").select("docid", "conv_id")
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), F.lit(":"), F.col("conv_id"))), 1, 8),
            16,
            10,
        ).cast("long")
        % F.lit(2**32)
    )
    thr = int(round(probability * 2**32))
    return (
        matched.join(fwd, "docid", "inner")
        .filter(h < thr)
        .join(dls, "docid", "inner")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.round(F.count(F.lit(1)) / F.lit(float(probability)))
            .cast("long")
            .alias("doc_count"),
            F.avg("dl").alias("avg_dl"),
        )
    )


def bucket_correlation_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    indicator: list[float],
    interval: str = "day",
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``bucket_correlation`` sibling pipeline agg (count_correlation
    function): Pearson correlation between the parent date_histogram's
    per-bucket doc counts and a caller-supplied indicator series of the
    same length (how ES scores a term's association with a metric
    profile). One row: (n_buckets, corr) — sample correlation, matching
    both engines' ``corr``.

    The parent histogram is the distributed matched ⋈ forward agg; this
    pass joins its OUTPUT (bucket-cardinality rows) against the
    broadcast indicator by bucket ordinal — never corpus-sized. The
    length check materializes only the bucket count (pipeline aggs see
    the reduced bucket list by contract, same as ES's own reduce phase).
    """
    hist = date_histogram(spark, index_dir, query, interval, cfg)
    n = hist.count()
    if n != len(indicator):
        raise ValueError(
            f"indicator length {len(indicator)} != bucket count {n}"
        )
    w = W.orderBy("period")
    idx = hist.select("period", "n_docs", (F.row_number().over(w) - 1).alias("__i"))
    ind = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(indicator)], "__i int, __v double"
    )
    return idx.join(F.broadcast(ind), "__i", "inner").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.corr(F.col("n_docs").cast("double"), F.col("__v")).alias("corr"),
    )


def change_point_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    interval: str = "day",
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``change_point`` sibling pipeline agg (step-change form):
    locate the bucket where the parent date_histogram's count series
    shifts level, as the split maximizing the Welch t-statistic between
    the prefix and suffix means. One row: (period, stat, type) with type
    ``step_up``/``step_down`` by the shift's sign. (ES also classifies
    spike/dip/trend; the step detector is the shape its docs lead with
    and the one a count series over time needs first.)

    Every candidate split is scored from cumulative sums over the
    REDUCED bucket stream — two window passes and a one-row total
    broadcast, cardinality ∝ bucket count. Splits need ≥2 buckets on
    each side (both variances defined); the argmax tie-breaks on the
    6-dp-rounded statistic then earliest period, the same cross-engine
    determinism contract as every scored path here.
    """
    hist = date_histogram(spark, index_dir, query, interval, cfg)
    return change_point_series(hist, value_col="n_docs", order_col="period")


def change_point_series(
    df: DataFrame, value_col: str, order_col: str
) -> DataFrame:
    """The step-change detector on ANY reduced (order, value) frame —
    shared by change_point_agg (index date_histogram counts) and the
    ES|QL CHANGE_POINT command. Math and determinism contract unchanged:
    argmax Welch t over every ≥2|≥2 split from cumulative sums, 6-dp
    tie-break then earliest order value. Returns one row
    (order_col, stat, type)."""
    w = W.orderBy(order_col).rowsBetween(W.unboundedPreceding, -1)
    v = F.col(value_col).cast("double")
    pre = df.select(
        order_col,
        value_col,
        F.count(v).over(w).alias("n1"),
        F.sum(v).over(w).alias("s1"),
        F.sum(v * v).over(w).alias("q1"),
    )
    tot = df.agg(
        F.count(v).alias("nt"), F.sum(v).alias("st"), F.sum(v * v).alias("qt")
    )
    j = pre.crossJoin(F.broadcast(tot)).select(
        order_col,
        "n1",
        (F.col("nt") - F.col("n1")).alias("n2"),
        F.col("s1"),
        (F.col("st") - F.col("s1")).alias("s2"),
        F.col("q1"),
        (F.col("qt") - F.col("q1")).alias("q2"),
    )
    m1 = F.col("s1") / F.col("n1")
    m2 = F.col("s2") / F.col("n2")
    var1 = (F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1")) / F.col("n1")
    var2 = (F.col("q2") - F.col("s2") * F.col("s2") / F.col("n2")) / F.col("n2")
    stat = F.try_divide(m2 - m1, F.sqrt(var1 / F.col("n1") + var2 / F.col("n2")))
    scored = (
        j.filter((F.col("n1") >= 2) & (F.col("n2") >= 2))
        .select(order_col, stat.alias("stat"))
        .filter(F.col("stat").isNotNull())
    )
    return (
        scored.orderBy(F.round(F.abs("stat"), 6).desc(), F.col(order_col).asc())
        .limit(1)
        .select(
            order_col,
            F.round("stat", 4).alias("stat"),
            F.when(F.col("stat") >= 0, F.lit("step_up"))
            .otherwise(F.lit("step_down"))
            .alias("type"),
        )
    )


def children_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    bucket_field: str = "role",
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``children`` agg over the transcripts' join field: bucket the
    MATCHED docs by ``bucket_field``, then per bucket step down to the
    children of those docs' conversations — every turn of every conv
    that had a matching doc in the bucket — and aggregate them
    (n_parents = distinct convs, n_children = their total turns,
    avg_child_dl). This is ES's parent/child ``children`` sub-agg
    rephrased onto the flat (conv_id = join field) layout the engine
    indexes, same answer a nested parent/child mapping would give.

    Scale shape: matched ⋈ forward for (bucket, conv) — distinct'd to
    parent grain BEFORE the fan-out — then one equi-join on conv_id
    against the column-pruned forward+lengths scan and a hash agg on the
    bucket. The distinct bounds the join's left side by the parent
    count; no driver materialization.
    """
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    out_schema = (
        f"{bucket_field} string, n_parents long, n_children long, avg_child_dl double"
    )
    if matched is None:
        return tbl.local_rows_df(spark, [], out_schema)
    fwd = tbl.read(spark, index_dir, "forward").select(
        "docid", "conv_id", bucket_field
    )
    parents = (
        matched.join(fwd, "docid", "inner")
        .select(bucket_field, "conv_id")
        .distinct()
    )
    kids = tbl.read(spark, index_dir, "forward").select("docid", "conv_id")
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    children = kids.join(dls, "docid", "inner")
    return (
        parents.join(children, "conv_id", "inner")
        .groupBy(bucket_field)
        .agg(
            F.countDistinct("conv_id").cast("long").alias("n_parents"),
            F.count(F.lit(1)).cast("long").alias("n_children"),
            F.avg("dl").alias("avg_child_dl"),
        )
        .orderBy(bucket_field)
    )


def parent_agg(
    spark: SparkSession,
    index_dir: str,
    query: str,
    bucket_field: str = "role",
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """ES ``parent`` agg — the step-UP inverse of ``children_agg``: bucket
    the MATCHED child docs (turns) by ``bucket_field``, then aggregate at
    the PARENT grain (conversation = join field). Each parent counts once
    per bucket no matter how many of its turns matched, exactly as ES
    dedups parent docs inside a ``parent`` sub-agg. Metrics per bucket:
    ``n_parents`` (distinct convs), ``avg_parent_turns`` (conv size over
    those parents), ``avg_parent_dl`` (total tokens per conv).

    Scale shape: the parent rollup is a hash agg of the column-pruned
    forward+lengths scan at conv grain; the matched side is distinct'd to
    (bucket, conv) BEFORE joining it, so the join's left side is bounded
    by the parent count. No driver materialization.
    """
    cfg = effective_config(spark, index_dir, cfg)
    matched = _matched_docids(spark, index_dir, query, cfg)
    out_schema = (
        f"{bucket_field} string, n_parents long,"
        " avg_parent_turns double, avg_parent_dl double"
    )
    if matched is None:
        return tbl.local_rows_df(spark, [], out_schema)
    fwd = tbl.read(spark, index_dir, "forward").select(
        "docid", "conv_id", bucket_field
    )
    parents = (
        matched.join(fwd, "docid", "inner")
        .select(bucket_field, "conv_id")
        .distinct()
    )
    kids = tbl.read(spark, index_dir, "forward").select("docid", "conv_id")
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    rollup = (
        kids.join(dls, "docid", "inner")
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("dl").cast("long").alias("conv_dl"),
        )
    )
    return (
        parents.join(rollup, "conv_id", "inner")
        .groupBy(bucket_field)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parents"),
            F.avg("n_turns").alias("avg_parent_turns"),
            F.avg("conv_dl").alias("avg_parent_dl"),
        )
        .orderBy(bucket_field)
    )


def variable_width_histogram(
    spark: SparkSession,
    index_dir: str,
    query: str,
    buckets: int = 10,
    cfg: IndexConfig | None = None,
    max_distinct: int = 65536,
) -> DataFrame:
    """ES ``variable_width_histogram`` over the matched docs' analyzed
    length: at most ``buckets`` variable-width clusters, each reported as
    (key = centroid mean, min, max, n_docs), ordered by min — ES's
    dynamically-sized alternative to fixed-interval ``histogram``.

    ES's implementation is shard-approximate (per-shard nearest-centroid
    streaming); this engine uses a DETERMINISTIC variant with the same
    output shape: agglomerative merging of adjacent value-clusters by
    smallest centroid gap (ties to the leftmost pair), which is exact on
    the weighted distinct-value set and invariant under partitioning —
    the cross-engine determinism contract approximate sketches can't meet.

    Scale shape: the distributed work is one (value → weight) hash agg —
    the clustering runs on the DISTINCT values (doc lengths: thousands,
    not corpus-sized), guarded by ``max_distinct`` with a loud error, the
    same bounded-driver pattern as IVF centroid training."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    cfg = effective_config(spark, index_dir, cfg)
    out_schema = "key double, min_dl long, max_dl long, n_docs long"
    matched = _matched_docids(spark, index_dir, query, cfg)
    if matched is None:
        return tbl.local_rows_df(spark, [], out_schema)
    dls = tbl.read(spark, index_dir, "doc_lens").select("docid", "dl")
    pairs = (
        matched.join(dls, "docid", "inner")
        .groupBy("dl")
        .agg(F.count(F.lit(1)).alias("w"))
        .orderBy("dl")
        .limit(max_distinct + 1)
        .collect()
    )
    if len(pairs) > max_distinct:
        raise ValueError(
            f"variable_width_histogram: > {max_distinct} distinct values; "
            "raise max_distinct or pre-bucket the field"
        )
    if not pairs:
        return tbl.local_rows_df(spark, [], out_schema)

    import numpy as np

    vals = np.array([float(r.dl) for r in pairs])
    wts = np.array([float(r.w) for r in pairs])
    # clusters start as one per distinct value; stored as parallel arrays
    sums, cnts = vals * wts, wts.copy()
    mins, maxs = vals.copy(), vals.copy()
    while len(cnts) > buckets:
        cent = sums / cnts
        gaps = cent[1:] - cent[:-1]
        i = int(np.argmin(gaps))  # ties: leftmost (argmin contract)
        sums[i] += sums[i + 1]
        cnts[i] += cnts[i + 1]
        maxs[i] = maxs[i + 1]
        keep = np.ones(len(cnts), dtype=bool)
        keep[i + 1] = False
        sums, cnts, mins, maxs = sums[keep], cnts[keep], mins[keep], maxs[keep]
    rows = [
        (float(s / c), int(lo), int(hi), int(c))
        for s, c, lo, hi in zip(sums, cnts, mins, maxs)
    ]
    return tbl.local_rows_df(spark, rows, out_schema)
