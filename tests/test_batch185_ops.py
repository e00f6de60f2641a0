"""Invariant tests for batch 185: MCC family."""

from __future__ import annotations

from pdal_spark.operators.stats import mcc_score


def test_mcc_perfect_and_inverted(spark):
    perfect = [(y, y) for y in (0, 1) for _ in range(5)]
    df = spark.createDataFrame(perfect, "y long, p long")
    r = mcc_score(df, "y", "p").collect()[0]
    assert r["mcc"] == 1.0 and r["bal_acc"] == 1.0
    inverted = [(y, 1 - y) for y in (0, 1) for _ in range(5)]
    df2 = spark.createDataFrame(inverted, "y long, p long")
    assert mcc_score(df2, "y", "p").collect()[0]["mcc"] == -1.0


def test_mcc_random_near_zero(spark):
    rows = [(y, p) for y in (0, 1) for p in (0, 1)
            for _ in range(10)]
    df = spark.createDataFrame(rows, "y long, p long")
    r = mcc_score(df, "y", "p").collect()[0]
    assert abs(r["mcc"]) < 1e-12
    assert abs(r["informedness"]) < 1e-12
