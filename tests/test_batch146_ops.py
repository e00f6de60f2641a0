"""Invariant tests for batch 146: seasonal anomaly, degree days."""

from __future__ import annotations

from pdal_spark.operators.temporal import degree_days, seasonal_anomaly


def test_seasonal_anomaly_within_season_zscore(spark):
    # season 0 values {10,20,30}; season 1 all 100 (constant)
    rows = [(0, 0, 10), (0, 1, 20), (0, 2, 30),
            (1, 3, 100), (1, 4, 100)]
    df = spark.createDataFrame(rows, "s long, o long, v long")
    out = {r["o"]: r for r in seasonal_anomaly(
        df, "s", "o", "v").collect()}
    assert abs(out[1]["z_r"]) < 1e-9           # at the mean
    assert abs(out[0]["z_r"] + 1.0) < 1e-9     # (10-20)/10
    assert out[3]["z_r"] is None               # constant season


def test_degree_days_split(spark):
    rows = [(0, 170), (0, 190), (0, 180), (1, 100)]
    df = spark.createDataFrame(rows, "k long, t long")
    out = {r["k"]: r for r in degree_days(
        df, "k", "t", base_temp=180).collect()}
    assert out[0]["hdd"] == 10 and out[0]["cdd"] == 10
    assert out[1]["hdd"] == 80 and out[1]["cdd"] == 0
