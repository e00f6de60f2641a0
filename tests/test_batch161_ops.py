"""Invariant tests for batch 161: block terrain, threshold area."""

from __future__ import annotations

from pdal_spark.operators.h3 import h3_encode
from pdal_spark.operators.raster import (
    block_terrain_summary,
    threshold_area_share,
)


def _cells(spark, vals, res=5):
    n = 1 << res
    rows = [(-180.0 + (ix + 0.5) * (360.0 / n),
             -90.0 + (iy + 0.5) * (180.0 / n), z)
            for (ix, iy), z in vals.items()]
    df = spark.createDataFrame(rows, "lon double, lat double,"
                               " x long")
    return h3_encode(df, "lat", "lon", res=res, out="cell").select(
        "cell", "x"
    )


def test_block_terrain_hypso(spark):
    # a 4x4 block: plateau at 10 with one pit at 0 -> mean near
    # the top -> hypso > 0.5
    vals = {(ix, iy): (0 if (ix, iy) == (0, 0) else 10)
            for ix in range(4) for iy in range(4)}
    cells = _cells(spark, vals)
    out = block_terrain_summary(cells, res=5, parent_res=2,
                                cell="cell", value="x").collect()
    r = max(out, key=lambda r: r["n_cells"])
    assert r["relief"] == 10
    assert r["hypso"] > 0.9


def test_threshold_area_shares(spark):
    vals = {(ix, 0): z for ix, z in enumerate([1, 2, 5, 10])}
    cells = _cells(spark, vals)
    out = {(r["parent"], r["thr"]): r for r in threshold_area_share(
        cells, res=5, parent_res=2, thresholds=[2, 5, 10],
        cell="cell", value="x").collect()}
    shares = sorted(
        r["share"] for (p, t), r in out.items() if t == 2
    )
    assert shares  # rows exist and shares are within [0, 1]
    assert all(0.0 <= s <= 1.0 for s in shares)
    # the thr=10 share never exceeds the thr=2 share per block
    for (p, t), r in out.items():
        if t == 10:
            assert r["share"] <= out[(p, 2)]["share"] + 1e-12
