"""Invariant tests for batch 167: box counting, radial profile."""

from __future__ import annotations

from pdal_spark.operators.h3 import h3_encode
from pdal_spark.operators.stats import (
    box_counting_dimension,
    radial_profile,
)


def test_box_counting_filled_plane_is_two(spark):
    n = 32
    rows = [(-180.0 + (ix + .5) * (360.0 / n),
             -90.0 + (iy + .5) * (180.0 / n))
            for ix in range(n) for iy in range(n)]
    df = spark.createDataFrame(rows, "lon double, lat double")
    cells = h3_encode(df, "lat", "lon", res=5,
                      out="cell").select("cell")
    r = box_counting_dimension(cells, res=5, coarser=[3, 4],
                               cell="cell").collect()[0]
    assert abs(r["dimension"] - 2.0) < 0.01


def test_box_counting_line_is_one(spark):
    n = 32
    rows = [(-180.0 + (ix + .5) * (360.0 / n), 0.1)
            for ix in range(n)]
    df = spark.createDataFrame(rows, "lon double, lat double")
    cells = h3_encode(df, "lat", "lon", res=5,
                      out="cell").select("cell")
    r = box_counting_dimension(cells, res=5, coarser=[3, 4],
                               cell="cell").collect()[0]
    assert abs(r["dimension"] - 1.0) < 0.05


def test_radial_profile_ring_membership(spark):
    # 4 points at exact distances from their own centroid (0,0):
    # centered cross at radius 10 -> all in band 1 for band_q=8
    rows = [(10, 0), (-10, 0), (0, 10), (0, -10)]
    df = spark.createDataFrame(rows, "px long, py long")
    out = {r["band"]: r["n_points"] for r in radial_profile(
        df, "px", "py", band_q=8, n_bands=4).collect()}
    assert out == {1: 4}
