"""Invariant tests for batch 141: geographic midpoint, grid
convergence."""

from __future__ import annotations

from pdal_spark.operators.transform import (
    geographic_midpoint,
    grid_convergence,
)


def test_midpoint_antimeridian_safe(spark):
    # points at lon 179 and -179: planar mean says 0 (wrong side
    # of the planet); spherical midpoint says 180
    df = spark.createDataFrame(
        [(0.0, 179.0), (0.0, -179.0)], "lat double, lon double"
    )
    r = geographic_midpoint(df).collect()[0]
    assert abs(abs(r["mid_lon_r"]) - 180.0) < 1e-4
    assert abs(r["mid_lat_r"]) < 1e-6


def test_midpoint_symmetric_latitudes(spark):
    df = spark.createDataFrame(
        [(45.0, 10.0), (-45.0, 10.0)], "lat double, lon double"
    )
    r = geographic_midpoint(df).collect()[0]
    assert abs(r["mid_lat_r"]) < 1e-6
    assert abs(r["mid_lon_r"] - 10.0) < 1e-4


def test_grid_convergence_signs(spark):
    # zone 33 central meridian = 15E; east of it in the northern
    # hemisphere gamma > 0, west < 0, on-meridian = 0
    df = spark.createDataFrame(
        [(1, 50.0, 18.0), (2, 50.0, 12.0), (3, 50.0, 15.0)],
        "i long, lat double, lon double",
    )
    out = {r["i"]: r["gamma_r"] for r in grid_convergence(
        df, zone=33).collect()}
    assert out[1] > 0 > out[2]
    assert out[3] == 0.0
    # magnitude ~ dlon * sin(lat): 3 deg * sin 50 ~ 2.3 deg
    assert 2.0 < out[1] < 2.6
