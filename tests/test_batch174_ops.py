"""Invariant tests for batch 174: Chatterjee xi, quadrant
association."""

from __future__ import annotations

from pdal_spark.operators.stats import chatterjee_xi, quadrant_assoc


def test_xi_detects_nonmonotone_function(spark):
    # y = (x-50)^2: kendall ~0 but xi high
    rows = [(i, i, (i - 50) * (i - 50)) for i in range(101)]
    df = spark.createDataFrame(rows, "i long, xv long, yv long")
    r = chatterjee_xi(df, "xv", "yv", "i").collect()[0]
    assert r["xi"] > 0.8


def test_xi_independent_near_zero(spark):
    rows = [(i, i % 17, (i * 7919) % 23) for i in range(200)]
    df = spark.createDataFrame(rows, "i long, xv long, yv long")
    r = chatterjee_xi(df, "xv", "yv", "i").collect()[0]
    assert abs(r["xi"]) < 0.25


def test_quadrant_assoc_signs(spark):
    pos = [(v, v) for v in range(21)]
    df = spark.createDataFrame(pos, "xv long, yv long")
    r = quadrant_assoc(df, "xv", "yv").collect()[0]
    assert r["qcr"] > 0.9
    neg = [(v, -v) for v in range(21)]
    df2 = spark.createDataFrame(neg, "xv long, yv long")
    assert quadrant_assoc(df2, "xv", "yv").collect()[0]["qcr"] \
        < -0.9
