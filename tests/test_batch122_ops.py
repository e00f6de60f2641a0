"""Invariant tests for batch 122: Davies-Bouldin, Siegel slope,
General G."""

from __future__ import annotations

from pdal_spark.operators.cluster import davies_bouldin
from pdal_spark.operators.h3 import h3_encode
from pdal_spark.operators.stats import general_g, siegel_slope


def test_davies_bouldin_separated_lower(spark):
    tight = [(0, x, y) for x in range(3) for y in range(3)] \
        + [(1, 200 + x, 200 + y) for x in range(3) for y in range(3)]
    close = [(0, x, y) for x in range(3) for y in range(3)] \
        + [(1, 4 + x, y) for x in range(3) for y in range(3)]
    d1 = spark.createDataFrame(tight, "g long, px long, py long")
    d2 = spark.createDataFrame(close, "g long, px long, py long")
    db1 = davies_bouldin(d1, "g", "px", "py").collect()[0]["db"]
    db2 = davies_bouldin(d2, "g", "px", "py").collect()[0]["db"]
    assert db1 < db2 / 10


def test_siegel_slope_resists_outliers(spark):
    # y = 2x except 40% wild outliers -> repeated median holds 2
    rows = []
    for i in range(30):
        y = 2 * i if i % 5 not in (0, 1) else 1000 + i
        rows.append((i, i, y))
    df = spark.createDataFrame(rows, "i long, x long, y long")
    r = siegel_slope(df, "x", "y", "i").collect()[0]
    assert abs(r["slope"] - 2.0) < 0.1


def test_general_g_high_clustering(spark):
    # two adjacent hot cells among far-apart cold ones
    rows = [(1, 0.0, 0.0, 100), (2, 360.0 / 32, 0.0, 100),
            (3, 90.0, 40.0, 1), (4, -90.0, -40.0, 1)]
    df = spark.createDataFrame(
        rows, "i long, lon double, lat double, v long"
    )
    cells = h3_encode(df, "lat", "lon", res=5, out="cell").select(
        "cell", "v"
    )
    r = general_g(cells, res=5, cell="cell", value="v").collect()[0]
    # hot-hot adjacency dominates: num = 2*100*100 over den
    assert r["num"] == 20000
    assert r["g"] > 0.9
