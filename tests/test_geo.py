"""Geo surface (operators/geo.py): geo_distance filter + sort,
bounding box (incl. antimeridian wrap), geotile_grid — all over runtime
coordinate fields, verified against a pure-Python haversine/tile
oracle over the forward table."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.operators.geo import (
    EARTH_RADIUS_KM,
    MERCATOR_LAT,
    geo_bounding_box_topk,
    geo_distance_sort,
    geo_distance_topk,
    geotile_grid,
)
from mysql_es_spark.operators.query import bm25_topk
from mysql_es_spark.oracle import build_oracle_index, score_query
from tests.conftest import TEST_CFG

Q = "w0 w3"
ORIGIN = (12.5, 42.0)

# deterministic synthetic coordinates from the doc's identity — the
# runtime-field pattern: any per-document SQL expression works
RM = {
    "lat": "(xxhash64(conv_id, turn_idx) % 17000) / 100.0",   # [-85, 85)
    "lon": "(xxhash64(turn_idx, conv_id) % 36000) / 200.0",   # [-90, 90)
}


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (
        math.sin((p2 - p1) / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin((math.radians(lon2) - math.radians(lon1)) / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def coords(spark, built_index):
    rows = (
        spark.read.parquet(f"{built_index}/forward")
        .select(
            "docid", "text",
            F.expr(RM["lat"]).cast("double").alias("lat"),
            F.expr(RM["lon"]).cast("double").alias("lon"),
        )
        .collect()
    )
    return {r.docid: r for r in rows}


@pytest.fixture(scope="module")
def base_scores(coords):
    oix = build_oracle_index([(d, r.text) for d, r in coords.items()])
    return dict(score_query(oix, Q, k=len(coords)))


def test_geo_distance_filter(spark, built_index, coords, base_scores):
    radius = 6000.0
    inside = {
        d for d, r in coords.items()
        if _hav(r.lat, r.lon, *ORIGIN) <= radius
    }
    assert 0 < len(inside) < len(coords)  # the filter actually cuts
    want = sorted(
        ((d, s) for d, s in base_scores.items() if d in inside),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = geo_distance_topk(
        spark, built_index, Q, ORIGIN[0], ORIGIN[1], radius,
        k=10, cfg=TEST_CFG, runtime_mappings=RM,
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, rel_tol=1e-12)


def test_geo_distance_sort(spark, built_index, coords, base_scores):
    matched = set(base_scores)
    want = sorted(
        ((_hav(coords[d].lat, coords[d].lon, *ORIGIN), d) for d in matched)
    )[:15]
    got = geo_distance_sort(
        spark, built_index, Q, ORIGIN[0], ORIGIN[1], size=15,
        cfg=TEST_CFG, runtime_mappings=RM,
    ).collect()
    assert [r.docid for r in got] == [d for _km, d in want]
    for r, (km, _d) in zip(got, want):
        assert math.isclose(r.geo_dist_km, km, rel_tol=1e-9)
    # deep page: search_after on the full sort tuple continues exactly
    last = got[-1]
    nxt = geo_distance_sort(
        spark, built_index, Q, ORIGIN[0], ORIGIN[1], size=5,
        search_after=[last.geo_dist_km, last.docid],
        cfg=TEST_CFG, runtime_mappings=RM,
    ).collect()
    want_all = sorted(
        ((_hav(coords[d].lat, coords[d].lon, *ORIGIN), d) for d in matched)
    )[15:20]
    assert [r.docid for r in nxt] == [d for _km, d in want_all]


def test_geo_bounding_box(spark, built_index, coords, base_scores):
    top, left, bottom, right = 60.0, -50.0, -10.0, 70.0
    inside = {
        d for d, r in coords.items()
        if bottom <= r.lat <= top and left <= r.lon <= right
    }
    want = sorted(
        ((d, s) for d, s in base_scores.items() if d in inside),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = geo_bounding_box_topk(
        spark, built_index, Q, top, left, bottom, right,
        k=10, cfg=TEST_CFG, runtime_mappings=RM,
    ).collect()
    assert [r.docid for r in got] == [d for d, _ in want]

    # antimeridian wrap: left > right means lon >= left OR lon <= right
    wleft, wright = 80.0, -80.0
    winside = {
        d for d, r in coords.items()
        if bottom <= r.lat <= top and (r.lon >= wleft or r.lon <= wright)
    }
    wwant = sorted(
        ((d, s) for d, s in base_scores.items() if d in winside),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    wgot = geo_bounding_box_topk(
        spark, built_index, Q, top, wleft, bottom, wright,
        k=10, cfg=TEST_CFG, runtime_mappings=RM,
    ).collect()
    assert [r.docid for r in wgot] == [d for d, _ in wwant]

    with pytest.raises(ValueError):
        geo_bounding_box_topk(
            spark, built_index, Q, -10.0, 0.0, 10.0, 20.0, cfg=TEST_CFG,
            runtime_mappings=RM,
        )


def test_geotile_grid(spark, built_index, coords, base_scores):
    z = 3
    n = 1 << z

    def tile(lat, lon):
        lat = max(min(lat, MERCATOR_LAT), -MERCATOR_LAT)
        x = int((lon + 180.0) / 360.0 * n)
        la = math.radians(lat)
        y = int((1.0 - math.log(math.tan(la) + 1.0 / math.cos(la)) / math.pi) / 2.0 * n)
        return f"{z}/{max(min(x, n - 1), 0)}/{max(min(y, n - 1), 0)}"

    counts: dict[str, int] = {}
    for d in base_scores:
        k = tile(coords[d].lat, coords[d].lon)
        counts[k] = counts.get(k, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
    got = geotile_grid(
        spark, built_index, Q, precision=z, size=12, cfg=TEST_CFG,
        runtime_mappings=RM,
    ).collect()
    assert [(r.key, r.doc_count) for r in got] == want
    # empty query → empty grid
    assert geotile_grid(
        spark, built_index, "", precision=z, cfg=TEST_CFG, runtime_mappings=RM
    ).count() == 0


def test_geo_filter_consistent_with_unfiltered(spark, built_index, coords):
    """Radius covering the whole planet ⇒ identical to plain BM25."""
    got = geo_distance_topk(
        spark, built_index, Q, 0.0, 0.0, 30000.0, k=10, cfg=TEST_CFG,
        runtime_mappings=RM,
    ).collect()
    want = bm25_topk(spark, built_index, Q, k=10, cfg=TEST_CFG).collect()
    assert [(r.docid, round(r.score, 9)) for r in got] == [
        (r.docid, round(r.score, 9)) for r in want
    ]
