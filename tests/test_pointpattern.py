"""Invariant tests for operators.pointpattern (classical
point-pattern statistics): constructed fixtures with known-shape
answers, plus the sf0.001 smoke that every gate returns rows."""

from __future__ import annotations

import math

from pdal_spark.operators import pointpattern as pp


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "pid long, lon double, lat double",
    )


def test_sd_ellipse_linear_pattern(spark):
    # points on the line lat = lon: sig2 ~ 0, theta = 45 degrees
    pts = [(i * 0.01, i * 0.01) for i in range(50)]
    row = pp.sd_ellipse(_df(spark, pts)).collect()[0]
    assert row["n"] == 50
    assert row["sig1"] > 0
    assert row["sig2"] < row["sig1"] * 1e-6
    assert abs(row["theta_r"] - math.pi / 4) < 1e-3


def test_sd_ellipse_axis_aligned(spark):
    # wide-in-lon, narrow-in-lat cloud: theta ~ 0, sig1 >> sig2
    pts = [(i * 0.1, (i % 3) * 0.001) for i in range(60)]
    row = pp.sd_ellipse(_df(spark, pts)).collect()[0]
    assert abs(row["theta_r"]) < 1e-2
    assert row["sig1"] > 10 * row["sig2"]


def test_quadrat_vmr_regular_vs_clustered(spark):
    # one point per cell -> variance 0 -> VMR 0
    reg = [(-180.0 + (i + 0.5) * 360.0 / 32, -90.0 + (j + 0.5) * 180.0 / 32)
           for i in range(8) for j in range(8)]
    r = pp.quadrat_stats(_df(spark, reg), res=5).collect()[0]
    assert r["n_occupied"] == 64
    assert abs(r["vmr"]) < 1e-9
    # everything in one cell -> VMR = variance/mean >> 1
    clu = [(10.0001 + 0.00001 * i, 10.0001) for i in range(64)]
    c = pp.quadrat_stats(_df(spark, clu), res=5).collect()[0]
    assert c["n_cells"] == 1
    # single occupied cell over a 1-cell bbox: variance 0 too — use
    # a 2-cell bbox instead to see clustering
    clu2 = clu + [(-170.0, -80.0)]
    c2 = pp.quadrat_stats(_df(spark, clu2), res=5).collect()[0]
    assert c2["vmr"] > 1.0


def test_clark_evans_regular_above_one(spark):
    # perfect grid is maximally dispersed: R > 1
    reg = [(i * 1.0, j * 1.0) for i in range(8) for j in range(8)]
    r = pp.clark_evans(_df(spark, reg), id_col="pid",
                       cell=1500.0).collect()[0]
    assert r["n"] == 64
    assert r["ce_index"] > 1.0


def test_clark_evans_clustered_below_one(spark):
    # two tight clumps far apart: R << 1
    pts = [(0.001 * i, 0.0) for i in range(20)]
    pts += [(50.0 + 0.001 * i, 50.0) for i in range(20)]
    r = pp.clark_evans(_df(spark, pts), id_col="pid",
                       cell=3000.0).collect()[0]
    assert r["ce_index"] < 0.5


def test_hull_diameter_square(spark):
    pts = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0),
           (0.5, 0.5), (0.2, 0.7)]
    row = pp.hull_diameter(_df(spark, pts), quant=1 << 10).collect()[0]
    q = 1 << 10
    # diagonal of the unit square on the quantized grid
    assert row["diam2"] == 2 * q * q
    assert (row["ax"], row["ay"]) == (0, 0)
    assert (row["bx"], row["by"]) == (q, q)


def test_join_counts_all_black_and_mixed(spark):
    blk = []
    for i in range(4):
        for j in range(4):
            lon = -180.0 + (i + 0.5) * 360.0 / 32
            lat = -90.0 + (j + 0.5) * 180.0 / 32
            blk += [(lon, lat)] * 3
    r = pp.join_counts(_df(spark, blk), res=5, threshold=2).collect()[0]
    assert r["n_black"] == 16 and r["n_white"] == 0
    assert r["ww"] == 0 and r["bw"] == 0
    assert r["bb"] == 24  # 2 * 4 * 3 rook adjacencies in a 4x4 block
    # checkerboard marks: bw dominates
    mix = []
    for i in range(4):
        for j in range(4):
            lon = -180.0 + (i + 0.5) * 360.0 / 32
            lat = -90.0 + (j + 0.5) * 180.0 / 32
            mix += [(lon, lat)] * (3 if (i + j) % 2 == 0 else 1)
    m = pp.join_counts(_df(spark, mix), res=5, threshold=2).collect()[0]
    assert m["bb"] == 0 and m["ww"] == 0 and m["bw"] == 24


def test_gates_smoke_sf0001(spark):
    from pdal_spark.gate import GATES

    for name in ["sd_ellipse", "quadrat_vmr", "clark_evans",
                 "hull_diameter", "join_counts"]:
        df = GATES[name].spark_fn(spark, "/root/testdata/sf0.001")
        assert df.count() > 0, name
