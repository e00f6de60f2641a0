"""Invariant tests for batch 175: distance correlation."""

from __future__ import annotations

from pdal_spark.operators.stats import distance_correlation


def _df(spark, pairs):
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i long, xv long, yv long",
    )


def test_dcor_linear_is_one(spark):
    df = _df(spark, [(v, 3 * v + 2) for v in range(30)])
    r = distance_correlation(df, "xv", "yv", "i").collect()[0]
    assert abs(r["dcor"] - 1.0) < 1e-9


def test_dcor_nonmonotone_detected(spark):
    df = _df(spark, [(v, (v - 15) * (v - 15)) for v in range(31)])
    r = distance_correlation(df, "xv", "yv", "i").collect()[0]
    assert r["dcor"] > 0.4


def test_dcor_independent_small(spark):
    df = _df(spark, [(v % 7, (v * 7919) % 11) for v in range(60)])
    r = distance_correlation(df, "xv", "yv", "i").collect()[0]
    assert r["dcor"] < 0.25
