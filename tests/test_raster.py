"""Raster ops vs numpy oracle replicating GDALGrid semantics."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark.operators import raster as R

RES, OX, OY, W, H = 10.0, 0.0, 0.0, 10, 8
RAD = RES * math.sqrt(2.0)


@pytest.fixture(scope="module")
def cloud(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(400),
            "x": rng.uniform(0, 100, 400),
            "y": rng.uniform(0, 80, 400),
            "z": rng.uniform(10, 20, 400),
        }
    )
    return spark.createDataFrame(pdf), pdf


def numpy_grid(pdf):
    """Direct replication of GDALGrid::addPoint radius updates."""
    cells = {}
    for _, p in pdf.iterrows():
        bi = int(np.floor((p.x - OX) / RES))
        bj = int(np.floor((p.y - OY) / RES))
        for di in range(-2, 3):
            for dj in range(-2, 3):
                i, j = bi + di, bj + dj
                if not (0 <= i < W and 0 <= j < H):
                    continue
                cx, cy = OX + (i + 0.5) * RES, OY + (j + 0.5) * RES
                d = math.hypot(cx - p.x, cy - p.y)
                if d < RAD:
                    cells.setdefault((i, j), []).append((p.z, d))
    return cells


def test_rasterize_matches_gdalgrid_oracle(cloud):
    sdf, pdf = cloud
    out = R.rasterize(
        sdf, RES, OX, OY, W, H, x="x", y="y", z="z", radius=RAD
    ).toPandas().set_index(["cell_i", "cell_j"])
    oracle = numpy_grid(pdf)
    assert set(out.index) == set(oracle)
    for key, vals in oracle.items():
        zs = np.array([v[0] for v in vals])
        ds = np.array([v[1] for v in vals])
        row = out.loc[key]
        assert row["cnt"] == len(zs)
        assert row["zmin"] == zs.min() and row["zmax"] == zs.max()
        assert math.isclose(row["zmean"], zs.mean(), rel_tol=1e-9)
        idw = (zs / ds).sum() / (1.0 / ds).sum()
        assert math.isclose(row["zidw"], idw, rel_tol=1e-9)
        assert math.isclose(
            row["zstdev"], zs.std(ddof=1), rel_tol=1e-9
        ) or (len(zs) == 1 and np.isnan(row["zstdev"]))


def test_window_fill_dense_grid(cloud):
    sdf, _ = cloud
    cells = R.rasterize(
        sdf, RES, OX, OY, W, H, x="x", y="y", z="z", radius=RAD
    )
    dense = R.window_fill(cells, W, H, window_size=3)
    assert dense.count() == W * H
    # every filled (cnt=0) cell got values from its neighbors
    filled = dense.where(F.col("cnt") == 0)
    assert filled.where(F.col("zmean").isNull()).count() == 0 or \
        filled.count() == 0


def test_colorize_dem_hag(spark):
    raster = [[float(10 * j + i) for i in range(10)] for j in range(8)]
    pdf = pd.DataFrame(
        {
            "pid": [0, 1, 2],
            "x": [5.0, 15.0, 999.0],  # cells (0,*), (1,*), out of range
            "y": [5.0, 25.0, 5.0],
            "z": [1.0, 22.0, 5.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = R.colorize(
        df, raster, RES, OX, OY, x="x", y="y"
    ).toPandas().sort_values("pid")
    assert out["band_1"].tolist()[:2] == [0.0, 21.0]
    assert np.isnan(out["band_1"].iloc[2])
    hag = R.hag_dem(
        df, raster, RES, OX, OY, x="x", y="y", z="z"
    ).toPandas().sort_values("pid")
    assert hag["height_above_ground"].tolist()[:2] == [1.0, 1.0]
    dem = R.dem_filter(
        df, raster, RES, OX, OY, limits=(0.0, 1.5), x="x", y="y", z="z"
    )
    assert dem.count() == 2


def test_density_boundary_dissolve_and_wkt(spark):
    """Three cells in an L: interior edges cancel, the dissolved
    boundary is one closed 8-edge ring; WKT assembly closes it."""
    from pdal_spark.operators.hexbin import (
        boundary_multipolygon,
        density_boundary_edges,
    )

    res = 6
    n = 1 << res
    sx, sy = 360.0 / n, 180.0 / n
    # cell centers of (ix,iy) = (10,10), (11,10), (10,11); 2 points
    # each so threshold=2 keeps them
    def center(ix, iy):
        return (-90.0 + (iy + 0.5) * sy, -180.0 + (ix + 0.5) * sx)

    rows = []
    for ix, iy in [(10, 10), (11, 10), (10, 11)]:
        la, lo = center(ix, iy)
        rows += [(la, lo), (la, lo)]
    df = spark.createDataFrame(rows, ["lat", "lon"])
    edges = density_boundary_edges(
        df, lat="lat", lon="lon", res=res, threshold=2
    ).toPandas()
    # L of 3 cells: 12 raw edges, 2 interior pairs cancel -> 8
    assert len(edges) == 8
    wkt = boundary_multipolygon(edges)
    # one ring, closed: MULTIPOLYGON (((x y, ... , x y)))
    assert wkt.startswith("MULTIPOLYGON (((")
    assert wkt.count("(((") == 1
    ring = wkt[wkt.index("(((") + 3: wkt.index(")))")]
    coords = ring.split(", ")
    # 8 edges -> 9 coordinate pairs with the closer repeated
    assert len(coords) == 9
    assert coords[0] == coords[-1]


def test_rasterize_binmode_percentiles(spark):
    """Bin-mode: every in-bounds point lands in exactly one cell;
    percentiles are ordered and bracketed by min/max."""
    from pdal_spark.operators import raster as R

    pts = spark.range(0, 500).select(
        ((F.col("id") % 100) * 0.7 - 30.0).alias("lat"),
        ((F.col("id") % 177) * 1.9 - 160.0).alias("lon"),
        ((F.col("id") % 23) * 1.0).alias("z"),
    )
    cells = R.rasterize_binmode(
        pts, resolution=10.0, origin_x=-180.0, origin_y=-90.0,
        width=36, height=18, z="z", deterministic=True,
    ).toPandas()
    assert cells["cnt"].sum() == 500
    assert (cells["p25"] <= cells["p50"]).all()
    assert (cells["p50"] <= cells["p75"]).all()
    assert (cells["zmin"] <= cells["p25"] + 1e-6).all()
    assert (cells["p75"] <= cells["zmax"] + 1e-6).all()
    # integer z through the 2^20 grid is exact: single-point cells
    # have p50 == z exactly
    singles = cells[cells.cnt == 1]
    assert (singles["p50"] == singles["zmin"]).all()
