"""Invariant tests for batch 143: pairwise diffs, trend
contrasts."""

from __future__ import annotations

from pdal_spark.operators.stats import (
    pairwise_mean_diffs,
    trend_contrasts,
)


def test_pairwise_diffs_values(spark):
    # groups with means 10, 20, 30 and small within-spread
    rows = []
    for g, base in ((0, 10), (1, 20), (2, 30)):
        rows += [(g, base - 1), (g, base), (g, base + 1)]
    df = spark.createDataFrame(rows, "g long, v long")
    out = {(r["gi"], r["gj"]): r for r in
           pairwise_mean_diffs(df, "g", "v").collect()}
    assert len(out) == 3
    assert abs(out[(0, 1)]["diff"] + 10.0) < 1e-9
    assert abs(out[(0, 2)]["diff"] + 20.0) < 1e-9
    # farther pair has the larger |q|
    assert abs(out[(0, 2)]["q_stat"]) > abs(out[(0, 1)]["q_stat"])


def test_trend_contrasts_linear_and_quadratic(spark):
    # perfectly linear means -> quad contrast ~ 0, lin > 0
    rows = [(g, 10 * g + r) for g in range(5) for r in (0, 0)]
    df = spark.createDataFrame(rows, "g long, v long")
    r1 = trend_contrasts(df, "g", "v").collect()[0]
    assert r1["lin"] > 0 and abs(r1["quad"]) < 1e-3
    # U-shaped means -> quadratic dominates
    rows2 = [(g, (g - 2) * (g - 2) * 10) for g in range(5)
             for _ in (0, 1)]
    df2 = spark.createDataFrame(rows2, "g long, v long")
    r2 = trend_contrasts(df2, "g", "v").collect()[0]
    assert abs(r2["lin"]) < 1e-3 and r2["quad"] > 0
