"""Invariant tests for batch 129: topographic wetness index."""

from __future__ import annotations

from pdal_spark.operators.h3 import h3_encode
from pdal_spark.operators.raster import wetness_index


def _dem(spark, vals, res=5):
    n = 1 << res
    rows = []
    for (ix, iy), z in vals.items():
        lon = -180.0 + (ix + 0.5) * (360.0 / n)
        lat = -90.0 + (iy + 0.5) * (180.0 / n)
        rows.append((lon, lat, z))
    df = spark.createDataFrame(rows, "lon double, lat double,"
                               " x long")
    return h3_encode(df, "lat", "lon", res=res, out="cell").select(
        "cell", "x"
    )


def test_twi_valley_bottom_wettest(spark):
    # a V-valley: column ix=2 lowest, everything drains into it
    vals = {(ix, iy): 10 * abs(ix - 2) + iy
            for ix in range(5) for iy in range(5)}
    cells = _dem(spark, vals)
    out = {r["cell"]: r for r in wetness_index(
        cells, res=5, z_scale=0.1).collect()}
    rows = list(out.values())
    # interior cells have defined TWI; accumulation-rich cells are
    # wetter than ridge cells at comparable slope
    defined = [r for r in rows if r["twi_r"] is not None]
    assert defined
    hi_acc = max(defined, key=lambda r: r["acc"])
    lo_acc = min(defined, key=lambda r: r["acc"])
    assert hi_acc["acc"] > lo_acc["acc"]
    assert hi_acc["twi_r"] > lo_acc["twi_r"] - 1e-9
