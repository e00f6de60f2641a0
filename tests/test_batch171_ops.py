"""Invariant tests for batch 171: rolling corr, residual DW."""

from __future__ import annotations

from pdal_spark.operators.temporal import residual_dw, rolling_corr


def test_rolling_corr_perfect_line(spark):
    rows = [(0, i, i, 2 * i + 5) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, o long, xv long,"
                               " yv long")
    out = [r["r_roll"] for r in rolling_corr(
        df, "k", "o", "xv", "yv", window_n=10).collect()
        if r["r_roll"] is not None]
    assert out and all(abs(v - 1.0) < 1e-9 for v in out)


def test_rolling_corr_short_frames_null(spark):
    rows = [(0, i, i, i) for i in range(5)]
    df = spark.createDataFrame(rows, "k long, o long, xv long,"
                               " yv long")
    out = rolling_corr(df, "k", "o", "xv", "yv",
                       window_n=10).collect()
    assert all(r["r_roll"] is None for r in out)


def test_residual_dw_perfect_fit_is_null(spark):
    # y = 3x exactly: residuals all 0 -> dw NULL (0/0 guard)
    rows = [(i, i % 5, 3 * (i % 5)) for i in range(40)]
    df = spark.createDataFrame(rows, "o long, xv long, yv long")
    assert residual_dw(df, "o", "xv", "yv").collect()[0]["dw"] \
        is None


def test_residual_dw_alternating_residuals_high(spark):
    # x constant-slope line with +1/-1 alternating noise:
    # residuals alternate -> DW near 4
    rows = [(i, i % 8, 2 * (i % 8) + (1 if i % 2 == 0 else -1))
            for i in range(40)]
    df = spark.createDataFrame(rows, "o long, xv long, yv long")
    r = residual_dw(df, "o", "xv", "yv").collect()[0]
    assert r["dw"] > 2.5
