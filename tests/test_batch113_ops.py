"""Invariant tests for batch 113: stereographic projection, Tissot
factors, cut/fill volumes."""

from __future__ import annotations

import math

from pdal_spark.operators.raster import cut_fill
from pdal_spark.operators.transform import (
    reproject_stereographic,
    tissot_mercator,
)


def test_stereographic_pole_and_equator(spark):
    df = spark.createDataFrame(
        [(1, 90.0, 0.0), (2, 0.0, 0.0), (3, 0.0, 90.0)],
        "i long, lat double, lon double",
    )
    out = {r["i"]: r for r in reproject_stereographic(
        df, "lat", "lon").collect()}
    # pole maps to origin
    assert out[1]["x_ste"] == 0.0 and out[1]["y_ste"] == 0.0
    # equator: rho = 2R; lon 0 -> straight down -y, lon 90 -> +x
    two_r = 2 * 6371008.8
    assert abs(out[2]["y_ste"] + two_r) < 0.01
    assert abs(out[3]["x_ste"] - two_r) < 0.01
    # -0.0 normalized
    assert str(out[1]["x_ste"])[0] != "-"


def test_tissot_factors_values(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, 60.0)], "i long, lat double"
    )
    out = {r["i"]: r for r in
           tissot_mercator(df, "lat", zoom=10).collect()}
    assert out[1]["k_r"] == 1.0 and out[1]["area_r"] == 1.0
    assert abs(out[2]["k_r"] - 2.0) < 1e-6       # sec 60 = 2
    assert abs(out[2]["area_r"] - 4.0) < 1e-6
    res0 = 2 * math.pi * 6378137.0 / 256 / 1024
    assert abs(out[1]["res_r"] - round(res0, 3)) < 1e-9


def test_cut_fill_hand_grid(spark):
    a = spark.createDataFrame(
        [(1, 10), (2, 5), (3, 7)], "cell long, x long"
    )
    b = spark.createDataFrame(
        [(1, 8), (2, 9), (4, 2)], "cell long, x long"
    )
    r = cut_fill(a, b, cell_area=2.0).collect()[0]
    # cell1: cut 2; cell2: fill 4; cell3: cut 7; cell4: fill 2
    assert r["n_cells"] == 4
    assert r["cut_q"] == 9 and r["fill_q"] == 6
    assert r["net_q"] == -3
    assert r["cut_vol"] == 18.0 and r["fill_vol"] == 12.0
