"""Invariant tests for batch 173: Sharpe/Sortino, streaks."""

from __future__ import annotations

from pdal_spark.operators.stats import sharpe_sortino, streak_stats


def test_sharpe_sortino_known(spark):
    rows = [(0, v) for v in (2, -1, 3, -2, 4, 0)]
    df = spark.createDataFrame(rows, "k long, v long")
    r = sharpe_sortino(df, "k", "v").collect()[0]
    assert r["dss"] == 5  # (-1)^2 + (-2)^2
    assert r["sharpe"] is not None and r["sortino"] is not None
    # downside sd < full sd here -> sortino > sharpe
    assert r["sortino"] > r["sharpe"]


def test_streaks(spark):
    vals = [1, 2, 3, -1, -2, 0, 4, -5, -6, -7, -8]
    rows = [(0, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, o long, v long")
    r = streak_stats(df, "k", "o", "v").collect()[0]
    assert r["max_win_streak"] == 3
    assert r["max_loss_streak"] == 4
    assert r["n_runs"] == 5
