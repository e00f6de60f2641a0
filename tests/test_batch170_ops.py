"""Invariant tests for batch 170: robust seasonal anomaly."""

from __future__ import annotations

from pdal_spark.operators.temporal import robust_seasonal_anomaly


def test_robust_anomaly_spike_scores_high(spark):
    vals = [10, 11, 12, 10, 11, 12, 100]
    rows = [(0, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "s long, o long, v long")
    out = {r["o"]: r["score_r"] for r in robust_seasonal_anomaly(
        df, "s", "o", "v").collect()}
    # med = 11, mad = 1: spike scores (100-11)/1 = 89
    assert out[6] == 89.0
    assert abs(out[0] + 1.0) < 1e-9


def test_robust_anomaly_constant_mad_null(spark):
    rows = [(0, i, 5) for i in range(6)]
    df = spark.createDataFrame(rows, "s long, o long, v long")
    out = robust_seasonal_anomaly(df, "s", "o", "v").collect()
    assert all(r["score_r"] is None for r in out)
