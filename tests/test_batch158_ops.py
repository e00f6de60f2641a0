"""Invariant tests for batch 158: local Geary, primacy index."""

from __future__ import annotations

from pdal_spark.operators.h3 import h3_encode
from pdal_spark.operators.stats import local_geary, primacy_index


def test_local_geary_flags_lone_spike(spark):
    n = 32
    rows = []
    for ix in range(6):
        for iy in range(6):
            v = 100 if (ix, iy) == (2, 2) else 10
            rows.append((-180.0 + (ix + 0.5) * (360.0 / n),
                         -90.0 + (iy + 0.5) * (180.0 / n), v))
    df = spark.createDataFrame(rows, "lon double, lat double,"
                               " x long")
    cells = h3_encode(df, "lat", "lon", res=5, out="cell").select(
        "cell", "x"
    )
    out = local_geary(cells, res=5, cell="cell",
                      value="x").collect()
    mx = max(out, key=lambda r: r["c_local"])
    # the spike cell is the most locally dissimilar
    assert mx["num_i"] > 0
    flat = [r["c_local"] for r in out if r["num_i"] == 0]
    assert flat and all(v == 0.0 for v in flat)


def test_primacy_index_values(spark):
    rows = [(1, 100), (2, 50), (3, 30), (4, 20), (5, 5)]
    df = spark.createDataFrame(rows, "e long, v long")
    r = primacy_index(df, "e", "v").collect()[0]
    assert r["v1"] == 100 and r["top4_sum"] == 200
    assert r["primacy"] == 0.5
