"""Batch-53: route_profile — slerp waypoints sampled against a
gridded field via bilinear interpolation (operator composition)."""

import pytest

from pdal_spark.operators import raster as ops_raster


def test_route_profile_affine_surface(spark):
    # complete 8x4 lattice with z affine in gx -> bilinear
    # reproduces the plane exactly at every waypoint
    cells = spark.createDataFrame(
        [(gx, gy, 10 * gx) for gx in range(8) for gy in range(4)],
        ["gx", "gy", "z"],
    )
    routes = spark.createDataFrame(
        [(1, 0.0, -90.0, 0.0, 0.0)],
        ["rid", "lat1", "lon1", "lat2", "lon2"],
    )
    out = sorted(
        ops_raster.route_profile(routes, cells, n=4, sub=1000)
        .collect(),
        key=lambda r: r.i,
    )
    assert len(out) == 5
    for r in out:
        # px maps lon linearly; surface z = 10 * gx -> v = px/100
        assert r.v == pytest.approx(10 * r.px / 1000.0, abs=1e-9)


def test_route_profile_equator_monotone(spark):
    cells = spark.createDataFrame(
        [(gx, gy, gx * gx) for gx in range(8) for gy in range(4)],
        ["gx", "gy", "z"],
    )
    routes = spark.createDataFrame(
        [(1, 0.0, -120.0, 0.0, 30.0)],
        ["rid", "lat1", "lon1", "lat2", "lon2"],
    )
    out = sorted(
        ops_raster.route_profile(routes, cells, n=6, sub=1000)
        .collect(),
        key=lambda r: r.i,
    )
    vals = [r.v for r in out]
    assert vals == sorted(vals)  # convex increasing along lon
