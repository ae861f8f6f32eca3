"""Geo queries/aggs — ES's geo surface over runtime coordinate fields.

The transcript schema carries no geo column (the round-4 disposition),
but ES deployments of the reference get geo for free the moment the
dynamic mapping (/root/reference/etc/template.json:64-130) types one —
and this engine's runtime fields (functions/runtime.py) are exactly the
mechanism to supply coordinates at query time without reindexing: a
``lat``/``lon`` pair is any pure per-document SQL expression over the
forward columns. On top of that, the ES geo surface reduces to
JVM-side math in filter context:

- :func:`geo_distance_topk` — ``bool{must: match, filter:
  geo_distance}``: BM25 top-k restricted to docs within ``radius_km``
  of an origin (haversine, the same great-circle formula ES's
  ``arc`` distance type uses). Delegates to ``bm25_filtered_topk``, so
  the filter is evaluated on the column-pruned forward scan and never
  touches scoring (idf/avgdl stay corpus-global).
- :func:`geo_distance_sort` — ``sort: [{_geo_distance: …}]``: the
  filter-context match set ordered by distance (scores never computed),
  via ``sorted_search`` on a runtime distance field; ``docid`` asc is
  the implicit tiebreak, search_after paging included for free.
- :func:`geo_bounding_box_topk` — ``filter: geo_bounding_box``: a pure
  range predicate on lat/lon (antimeridian-crossing boxes supported by
  the ES convention left > right ⇒ wrap).
- :func:`geotile_grid` — the ``geotile_grid`` aggregation: match-set
  doc counts per web-mercator tile ``z/x/y`` (ES's grid agg that is
  exact and mergeable — unlike geohash_grid's base32 strings, the tile
  math is closed-form SQL, so the DuckDB oracle expresses it too).

Scale shape: everything is whole-stage-codegen expressions over the
forward table joined to a query-proportional match set — no UDFs, no
driver collects beyond the returned page.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig

EARTH_RADIUS_KM = 6371.0088  # IUGG mean — what ES's arc distance uses
# web-mercator latitude clamp (ES geotile_grid contract)
MERCATOR_LAT = 85.05112878


def haversine_km(lat_col, lon_col, origin_lat: float, origin_lon: float):
    """Great-circle distance (km) from each row's (lat, lon) to the
    origin — pure Catalyst math, codegen-friendly."""
    lat1 = F.radians(F.lit(float(origin_lat)))
    lon1 = F.radians(F.lit(float(origin_lon)))
    lat2 = F.radians(lat_col.cast("double"))
    lon2 = F.radians(lon_col.cast("double"))
    a = (
        F.pow(F.sin((lat2 - lat1) / 2), 2)
        + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin((lon2 - lon1) / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_sql(lat_expr: str, lon_expr: str, origin_lat: float, origin_lon: float) -> str:
    """The same haversine as a SQL string (for runtime_mappings /
    oracles). Kept textually parallel to :func:`haversine_km`."""
    return (
        f"2.0 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"pow(sin((radians(cast(({lat_expr}) as double)) - radians({float(origin_lat)!r})) / 2), 2)"
        f" + cos(radians({float(origin_lat)!r})) * cos(radians(cast(({lat_expr}) as double)))"
        f" * pow(sin((radians(cast(({lon_expr}) as double)) - radians({float(origin_lon)!r})) / 2), 2)"
        f"))"
    )


def geo_distance_topk(
    spark: SparkSession,
    index_dir: str,
    query: str,
    origin_lat: float,
    origin_lon: float,
    radius_km: float,
    lat: str = "lat",
    lon: str = "lon",
    k: int = 10,
    cfg: IndexConfig | None = None,
    with_keys: bool = False,
    runtime_mappings: dict[str, str] | None = None,
) -> DataFrame:
    """ES ``bool{must: match, filter: geo_distance}``: BM25 top-k among
    docs within ``radius_km`` of the origin. ``lat``/``lon`` name either
    real forward columns or runtime fields supplied in
    ``runtime_mappings``."""
    from .query import bm25_filtered_topk

    rm = dict(runtime_mappings or {})
    flt = (
        haversine_sql(lat, lon, origin_lat, origin_lon)
        + f" <= {float(radius_km)!r}"
    )
    return bm25_filtered_topk(
        spark, index_dir, query, flt, k=k, cfg=cfg, with_keys=with_keys,
        runtime_mappings=rm or None,
    )


def geo_distance_sort(
    spark: SparkSession,
    index_dir: str,
    query: str,
    origin_lat: float,
    origin_lon: float,
    lat: str = "lat",
    lon: str = "lon",
    size: int = 10,
    order: str = "asc",
    search_after: list | None = None,
    cfg: IndexConfig | None = None,
    runtime_mappings: dict[str, str] | None = None,
) -> DataFrame:
    """ES ``sort: [{_geo_distance: {...}}]``: the filter-context match
    set ordered by great-circle distance (km) from the origin. Returns
    the sort key as ``geo_dist_km`` alongside the doc columns, exactly
    as ES returns the computed sort values.

    Runtime fields can't see each other (functions/runtime.py contract),
    so when ``lat``/``lon`` are themselves runtime fields their
    EXPRESSIONS are inlined into the distance field rather than
    referenced by name."""
    from .query import sorted_search

    rm = dict(runtime_mappings or {})
    lat_expr = rm.pop(lat, lat)
    lon_expr = rm.pop(lon, lon)
    rm["geo_dist_km"] = haversine_sql(lat_expr, lon_expr, origin_lat, origin_lon)
    return sorted_search(
        spark, index_dir, query, [("geo_dist_km", order)], size=size,
        search_after=search_after, cfg=cfg, runtime_mappings=rm,
    )


def geo_bounding_box_topk(
    spark: SparkSession,
    index_dir: str,
    query: str,
    top: float,
    left: float,
    bottom: float,
    right: float,
    lat: str = "lat",
    lon: str = "lon",
    k: int = 10,
    cfg: IndexConfig | None = None,
    with_keys: bool = False,
    runtime_mappings: dict[str, str] | None = None,
) -> DataFrame:
    """ES ``filter: geo_bounding_box``. ES convention: ``left > right``
    means the box crosses the antimeridian (lon >= left OR lon <=
    right)."""
    from .query import bm25_filtered_topk

    if not (-90.0 <= bottom <= top <= 90.0):
        raise ValueError(f"bad latitude bounds top={top} bottom={bottom}")
    latc = f"cast(({lat}) as double)"
    lonc = f"cast(({lon}) as double)"
    lon_pred = (
        f"({lonc} >= {float(left)!r} OR {lonc} <= {float(right)!r})"
        if left > right
        else f"({lonc} >= {float(left)!r} AND {lonc} <= {float(right)!r})"
    )
    flt = (
        f"{latc} <= {float(top)!r} AND {latc} >= {float(bottom)!r} AND {lon_pred}"
    )
    return bm25_filtered_topk(
        spark, index_dir, query, flt, k=k, cfg=cfg, with_keys=with_keys,
        runtime_mappings=runtime_mappings,
    )


def geotile_key_sql(lat_expr: str, lon_expr: str, zoom: int) -> tuple[str, str]:
    """(tile_x, tile_y) SQL for web-mercator zoom level ``zoom`` — the
    ES geotile_grid key math (OSM slippy-map tiles), latitude clamped to
    ±85.05112878 as ES does. Closed-form SQL so the DuckDB oracle can
    reproduce it exactly."""
    if not (0 <= int(zoom) <= 29):
        raise ValueError(f"geotile precision must be 0..29, got {zoom}")
    n = float(1 << int(zoom))
    latc = (
        f"greatest(least(cast(({lat_expr}) as double), {MERCATOR_LAT!r}), "
        f"{-MERCATOR_LAT!r})"
    )
    lonc = f"cast(({lon_expr}) as double)"
    tx = f"cast(floor((({lonc}) + 180.0) / 360.0 * {n!r}) as bigint)"
    ty = (
        f"cast(floor((1.0 - ln(tan(radians({latc})) + 1.0/cos(radians({latc})))"
        f" / {math.pi!r}) / 2.0 * {n!r}) as bigint)"
    )
    # ES clamps the tile indices into [0, 2^z) (poles land on the edge tile)
    nmax = (1 << int(zoom)) - 1
    tx = f"greatest(least({tx}, {nmax}), 0)"
    ty = f"greatest(least({ty}, {nmax}), 0)"
    return tx, ty


def geotile_grid(
    spark: SparkSession,
    index_dir: str,
    query: str,
    precision: int = 5,
    lat: str = "lat",
    lon: str = "lon",
    size: int = 20,
    cfg: IndexConfig | None = None,
    runtime_mappings: dict[str, str] | None = None,
) -> DataFrame:
    """ES ``geotile_grid`` aggregation over the match set: doc counts
    per "z/x/y" tile key, largest buckets first (key asc tiebreak),
    top ``size`` buckets. Exact (a count per group), mergeable, no
    collect beyond the returned page."""
    from ..functions.runtime import compile_runtime_fields
    from ..sources import tables as tbl
    from .query import (
        _decode_docids,
        _mask_deleted,
        _matching_blocks,
        corpus_stats,
        deleted_docids,
        effective_config,
        query_terms,
        term_meta,
    )

    cfg = effective_config(spark, index_dir, cfg)
    terms = query_terms(query)
    empty = tbl.local_rows_df(spark, [], "key string, doc_count long")
    if not terms:
        return empty
    stats = corpus_stats(spark, index_dir)
    idf, buckets = term_meta(spark, index_dir, terms, stats["n_docs"], cfg)
    terms = [t for t in terms if t in idf]
    if not terms:
        return empty
    blocks = _matching_blocks(spark, index_dir, terms, buckets)
    matched = _mask_deleted(_decode_docids(blocks), deleted_docids(spark, index_dir))
    fwd = tbl.read(spark, index_dir, "forward")
    fwd = compile_runtime_fields(fwd, dict(runtime_mappings or {}))
    tx, ty = geotile_key_sql(lat, lon, precision)
    rows = (
        fwd.join(matched, "docid", "left_semi")
        .select(
            F.concat_ws(
                "/", F.lit(int(precision)), F.expr(tx), F.expr(ty)
            ).alias("key")
        )
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(int(size))
    )
    return rows
