"""Invariant tests for batch 152: Bowker symmetry, Yule's Q."""

from __future__ import annotations

from pdal_spark.operators.stats import bowker_test, yules_q


def test_bowker_symmetric_zero(spark):
    rows = [(0, 1)] * 5 + [(1, 0)] * 5 + [(1, 2)] * 3 \
        + [(2, 1)] * 3 + [(0, 0)] * 4
    df = spark.createDataFrame(rows, "i long, j long")
    r = bowker_test(df, "i", "j").collect()[0]
    assert r["chi2"] == 0.0


def test_bowker_asymmetric_positive(spark):
    # label 0 -> 1 much more often than 1 -> 0
    rows = [(0, 1)] * 12 + [(1, 0)] * 2 + [(0, 0)] * 5
    df = spark.createDataFrame(rows, "i long, j long")
    r = bowker_test(df, "i", "j").collect()[0]
    # (12-2)^2/14 = 100/14 ~ 7.1429 (quantized floor)
    assert abs(r["chi2"] - 100 / 14) < 1e-3
    assert r["n_pairs"] == 1


def test_yules_q_bounds(spark):
    # perfect association: b = c = 0 -> Q = 1
    rows = [(1, 1)] * 5 + [(0, 0)] * 5
    df = spark.createDataFrame(rows, "xv long, yv long")
    assert yules_q(df, "xv", "yv").collect()[0]["q"] == 1.0
    # independence-ish: Q near 0
    rows2 = [(1, 1), (1, 0), (0, 1), (0, 0)] * 5
    df2 = spark.createDataFrame(rows2, "xv long, yv long")
    assert abs(yules_q(df2, "xv", "yv").collect()[0]["q"]) < 1e-12
