"""GeoJSON flattening (SURVEY §2.8 N1-N5, F9-F10) incl. the LJ:40 bug fix:
dest_long must be the last point's longitude, not a copy of dest_lat."""

from __future__ import annotations

import json

from logistream_data_pipeline_aws_spark.sources.geojson import (
    flatten_geojson_routes,
    read_geojson,
)

FEATURES = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "geometry": {
                "type": "LineString",
                "coordinates": [[-80.1, 25.7], [-81.0, 26.5], [-82.3, 27.9]],
            },
        },
        {
            "type": "Feature",
            "geometry": {"type": "LineString", "coordinates": [[10.0, 20.0], [30.5, 40.25]]},
        },
    ],
}


def test_flatten_routes(spark, tmp_path):
    p = tmp_path / "routes.geojson"
    p.write_text(json.dumps(FEATURES))
    feats = read_geojson(spark, str(p))
    assert feats.count() == 2
    out = {r.shape_wkt: r for r in flatten_geojson_routes(feats).collect()}

    wkt1 = "LINESTRING(-80.1 25.7, -81 26.5, -82.3 27.9)"
    r1 = out[wkt1]
    # coordinates are [lon, lat]; origin = first point, dest = last point
    assert (r1.origin_lat, r1.origin_long) == (25.7, -80.1)
    assert (r1.dest_lat, r1.dest_long) == (27.9, -82.3)  # NOT (27.9, 27.9): LJ:40 bug fixed

    wkt2 = "LINESTRING(10 20, 30.5 40.25)"
    r2 = out[wkt2]
    assert (r2.origin_lat, r2.origin_long, r2.dest_lat, r2.dest_long) == (20.0, 10.0, 40.25, 30.5)


def test_route_geometry_stats_invariants(spark):
    """Path length can never beat the straight line (triangle
    inequality), sinuosity is >= 1 whenever defined, and every route
    has at least two vertices."""
    from logistream_data_pipeline_aws_spark.plans.extensions import (
        route_geometry_stats,
    )

    rows = route_geometry_stats(spark, "unused").collect()
    assert len(rows) == 41
    for r in rows:
        assert r.n_points >= 2
        assert r.path_deg >= r.straight_deg - 1e-12
        if r.sinuosity is not None:
            assert r.sinuosity >= 1.0 - 1e-12
    # the fixture contains genuinely wiggly routes, not just segments
    assert any(r.sinuosity and r.sinuosity > 1.01 for r in rows)


def test_route_geometry_stats_single_vertex_route(spark, monkeypatch):
    """A degenerate 1-point LINESTRING yields path 0 / straight 0 /
    sinuosity NULL instead of INVALID_INDEX_OF_ZERO: Spark's
    sequence(1, 0) is descending ([1, 0]), so the ungated segment
    transform would evaluate element_at(xs, 0) (ADVICE r4)."""
    from logistream_data_pipeline_aws_spark.plans import extensions as X

    routes = spark.createDataFrame(
        [
            (1.0, 2.0, 1.0, 2.0, "LINESTRING(2 1)"),
            (0.0, 0.0, 4.0, 3.0, "LINESTRING(0 0, 3 4)"),
        ],
        ["origin_lat", "origin_long", "dest_lat", "dest_long", "shape_wkt"],
    )
    monkeypatch.setattr(X, "geojson_routes", lambda spark, sf_dir: routes)
    rows = {r.n_points: r for r in X.route_geometry_stats(spark, "unused").collect()}
    assert rows[1].path_deg == 0.0
    assert rows[1].straight_deg == 0.0
    assert rows[1].sinuosity is None
    assert abs(rows[2].path_deg - 5.0) < 1e-12
    assert abs(rows[2].straight_deg - 5.0) < 1e-12
