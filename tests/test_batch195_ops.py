"""Invariant tests for batch 195: threshold crossing, burn rate."""

from __future__ import annotations

from pdal_spark.operators.temporal import burn_rate, threshold_crossing


def test_threshold_crossing_linear(spark):
    # v = 10 + 2t: hits 100 at t = 45 -> 25 positions past n = 20
    rows = [(t, 10 + 2 * (t + 1)) for t in range(20)]
    df = spark.createDataFrame(rows, "o long, v long")
    r = threshold_crossing(df, "o", "v", threshold=100).collect()[0]
    assert abs(r["slope"] - 2.0) < 1e-9
    assert abs(r["t_cross"] - 25.0) < 1e-6


def test_threshold_crossing_declining_null(spark):
    rows = [(t, 100 - t) for t in range(20)]
    df = spark.createDataFrame(rows, "o long, v long")
    assert threshold_crossing(df, "o", "v",
                              threshold=200).collect()[0]["t_cross"] \
        is None


def test_burn_rate_windows(spark):
    # last 10 events: 5 errors; last 100: 5 errors; budget 1%
    rows = [(t, 1 if t >= 95 and t % 2 == 1 else 0)
            for t in range(100)]
    df = spark.createDataFrame(rows, "o long, e long")
    out = {r["w"]: r for r in burn_rate(
        df, "o", "e", budget_num=1, budget_den=100,
        windows=[10, 100]).collect()}
    assert out[10]["n_errors"] == 3  # t=95,97,99
    assert abs(out[10]["burn"] - 30.0) < 1e-9
    assert abs(out[100]["burn"] - 3.0) < 1e-9
