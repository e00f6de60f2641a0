"""Invariant tests for batch 114: focal majority, histogram
equalization, affine from GCPs."""

from __future__ import annotations

from pdal_spark.operators.raster import (
    focal_majority,
    histogram_equalize,
)
from pdal_spark.operators.transform import affine_from_gcps


def test_histogram_equalize_levels(spark):
    cells = spark.createDataFrame(
        [(i, v) for i, v in enumerate([1, 1, 2, 3, 3, 3, 9, 10])],
        "cell long, x long",
    )
    out = {r["c"]: r["level"] for r in
           histogram_equalize(cells, levels=8).collect()}
    # cprev: v=1 -> 0, v=2 -> 2, v=3 -> 3, v=9 -> 6, v=10 -> 7
    assert out[0] == 0 and out[2] == 2 and out[3] == 3
    assert out[6] == 6 and out[7] == 7


def test_affine_from_gcps_exact_recovery(spark):
    # noiseless affine: recovered exactly
    pts = [(x, y, 2 * x + 3 * y + 7, -x + 4 * y - 11)
           for x in range(5) for y in range(5)]
    df = spark.createDataFrame(pts, "x long, y long, tx long, ty long")
    r = affine_from_gcps(df).collect()[0]
    assert abs(r["a"] - 2) < 1e-9 and abs(r["b"] - 3) < 1e-9
    assert abs(r["c"] - 7) < 1e-9
    assert abs(r["d"] + 1) < 1e-9 and abs(r["e"] - 4) < 1e-9
    assert abs(r["f"] + 11) < 1e-9


def test_affine_degenerate_null(spark):
    # collinear GCPs -> singular normal matrix -> NULLs
    pts = [(i, i, i, i) for i in range(5)]
    df = spark.createDataFrame(pts, "x long, y long, tx long, ty long")
    r = affine_from_gcps(df).collect()[0]
    assert r["a"] is None and r["f"] is None


def test_focal_majority_smooths_lone_cell(spark):
    # 3x3 patch of category 1 with the center labeled 9: majority
    # flips the center to 1; ties elsewhere break to smallest
    from pdal_spark.operators.h3 import h3_encode

    rows = []
    for ix in range(3):
        for iy in range(3):
            lon = -180.0 + (ix + 0.5) * (360.0 / 32)
            lat = -90.0 + (iy + 0.5) * (180.0 / 32)
            cat = 9 if (ix, iy) == (1, 1) else 1
            rows.append((ix * 3 + iy, lon, lat, cat))
    df = spark.createDataFrame(
        rows, "i long, lon double, lat double, v long"
    )
    cells = h3_encode(df, "lat", "lon", res=5, out="cell").select(
        "cell", "v"
    )
    out = focal_majority(cells, res=5, value="v").collect()
    by_cell = {r["c"]: r["cat_maj"] for r in out}
    # every cell's neighborhood is dominated by 1s
    assert set(by_cell.values()) == {1}
