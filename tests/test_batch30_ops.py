"""Batch-30: colorinterp k-stddev auto-bounds, normals MST-style
refine (VERDICT r1 #10)."""

import math

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import features as ops_features
from pdal_spark.operators import transform as ops_transform


def test_colorinterp_stddev_bounds(spark):
    # values 0..99: mean 49.5, pop std = sqrt((n^2-1)/12) ~ 28.866
    df = spark.range(100).selectExpr("cast(id as double) AS v")
    out = ops_transform.colorinterp_stddev(df, "v", k=1.0)
    rows = {r.v: (r.red, r.green, r.blue) for r in out.collect()}
    std = math.sqrt((100.0 * 100.0 - 1.0) / 12.0)
    lo, hi = 49.5 - std, 49.5 + std
    # below-lo values clamp to the first ramp color, above-hi to last
    assert rows[0.0] == (0, 0, 255)
    assert rows[99.0] == (255, 0, 0)
    # a mid value lands mid-ramp
    n = 6
    b = min(max(int((49.5 - lo) / (hi - lo) * n), 0), n - 1)
    assert b in (2, 3)
    # same-valued column -> std 0 -> all one bucket, no crash
    const = spark.range(10).selectExpr("cast(5 as double) AS v")
    out2 = ops_transform.colorinterp_stddev(const, "v").collect()
    assert len({(r.red, r.green, r.blue) for r in out2}) == 1


def _line_points(spark, n=12):
    # points along the x axis: true normals are +/-y; eigen-normals
    # come out sign-mixed only by tie-break, so flip half manually
    rows = []
    for i in range(n):
        sign = -1.0 if i % 3 == 0 else 1.0
        rows.append((i, float(i), 0.0, 0.0, sign))
    return spark.createDataFrame(
        rows, ["pid", "lon", "lat", "normal_x", "normal_y"]
    )


def test_normals_refine_makes_line_consistent(spark):
    df = _line_points(spark)
    out = ops_features.normals_refine(df, radius=1.5).collect()
    ys = [r.normal_y for r in out]
    # all normals agree in sign after refinement
    assert len({y > 0 for y in ys}) == 1
    # seed (pid 0, a local min) kept its original sign (-1)
    assert all(y < 0 for y in ys)
    # magnitudes untouched
    assert all(abs(abs(y) - 1.0) < 1e-12 for y in ys)


def test_normals_refine_components_independent(spark):
    # two far-apart clusters: each oriented internally, independently
    rows = []
    for i in range(5):
        rows.append((i, float(i), 0.0, 0.0, 1.0 if i else -1.0))
    for i in range(5, 10):
        rows.append((i, 1000.0 + i, 0.0, 0.0, 1.0))
    df = spark.createDataFrame(
        rows, ["pid", "lon", "lat", "normal_x", "normal_y"]
    )
    out = {r.pid: r.normal_y for r in
           ops_features.normals_refine(df, radius=1.5).collect()}
    assert len({out[i] > 0 for i in range(5)}) == 1
    assert len({out[i] > 0 for i in range(5, 10)}) == 1
    # cluster 2's seed is pid 5 (+1): stays positive
    assert out[5] > 0
    # cluster 1's seed is pid 0 (-1): whole cluster negative
    assert out[0] < 0 and out[4] < 0
