"""Invariant tests for batch 164: CV/SNR, midhinge/IQR."""

from __future__ import annotations

from pdal_spark.operators.stats import cv_mean_ratio, midhinge_iqr


def test_cv_snr_known(spark):
    rows = [(0, v) for v in (8, 10, 12)]
    df = spark.createDataFrame(rows, "k long, v long")
    r = cv_mean_ratio(df, "k", "v").collect()[0]
    # mean 10, sd 2 -> cv 0.2, snr 5
    assert abs(r["cv"] - 0.2) < 1e-12
    assert abs(r["snr"] - 5.0) < 1e-12


def test_cv_constant_null(spark):
    df = spark.createDataFrame([(0, 5)] * 4, "k long, v long")
    r = cv_mean_ratio(df, "k", "v").collect()[0]
    assert r["snr"] is None and r["cv"] == 0.0


def test_midhinge_iqr_known(spark):
    rows = [(0, v) for v in range(1, 13)]  # 1..12
    df = spark.createDataFrame(rows, "k long, v long")
    r = midhinge_iqr(df, "k", "v").collect()[0]
    # ranks: q1 at ceil(12/4)... (12+3)//4 = 3 -> 3;
    # q3 at (36+3)//4 = 9 -> 9
    assert r["q1"] == 3 and r["q3"] == 9
    assert r["midhinge2"] == 12 and r["iqr"] == 6
