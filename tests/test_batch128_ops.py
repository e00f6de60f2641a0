"""Invariant tests for batch 128: Moran correlogram, lacunarity."""

from __future__ import annotations

from pdal_spark.operators.h3 import h3_encode
from pdal_spark.operators.stats import lacunarity, moran_correlogram


def _grid_cells(spark, vals, res=5):
    # vals: dict (ix, iy) -> value laid on the res grid
    n = 1 << res
    rows = []
    for (ix, iy), v in vals.items():
        lon = -180.0 + (ix + 0.5) * (360.0 / n)
        lat = -90.0 + (iy + 0.5) * (180.0 / n)
        rows.append((lon, lat, v))
    df = spark.createDataFrame(rows, "lon double, lat double,"
                               " x long")
    return h3_encode(df, "lat", "lon", res=res, out="cell").select(
        "cell", "x"
    )


def test_correlogram_decays_for_local_cluster(spark):
    # a tight high-value block in a low background: ring-1 I above
    # ring-3 I
    vals = {}
    for ix in range(8):
        for iy in range(8):
            vals[(ix, iy)] = 100 if (ix < 2 and iy < 2) else 1
    cells = _grid_cells(spark, vals)
    out = {r["ring"]: r for r in moran_correlogram(
        cells, res=5, max_ring=3, cell="cell", value="x"
    ).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["morans_i"] > out[3]["morans_i"]


def test_lacunarity_clumped_exceeds_even(spark):
    even = {(ix, iy): 4 for ix in range(8) for iy in range(8)}
    clumped = {(ix, iy): (64 if ix < 2 and iy < 2 else 0)
               for ix in range(8) for iy in range(8)}
    lc_even = {r["r"]: r["lac"] for r in lacunarity(
        _grid_cells(spark, even), res=5, coarser=[2, 3],
        cell="cell", value="x").collect()}
    lc_clump = {r["r"]: r["lac"] for r in lacunarity(
        _grid_cells(spark, clumped), res=5, coarser=[2, 3],
        cell="cell", value="x").collect()}
    for r in (2, 3):
        assert abs(lc_even[r] - 1.0) < 1e-9   # uniform -> L = 1
    # at r=2 the whole 8x8 patch fits ONE box (L = 1 trivially);
    # r=3 splits it 2x2 and the clump shows: L = 4
    assert abs(lc_clump[3] - 4.0) < 1e-9
    assert lc_clump[3] > lc_even[3]
