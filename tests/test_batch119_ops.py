"""Invariant tests for batch 119: Youden cutoff, James-Stein,
Mahalanobis 2D."""

from __future__ import annotations

from pdal_spark.operators.stats import (
    james_stein_means,
    mahalanobis_2d,
    youden_cutoff,
)


def test_youden_perfect_separation(spark):
    rows = [(s, 1 if s >= 50 else 0) for s in range(100)]
    df = spark.createDataFrame(rows, "v long, y long")
    r = youden_cutoff(df, "v", "y").collect()[0]
    assert r["t_star"] == 50 and r["j"] == 1.0
    assert r["tp"] == 50 and r["fp"] == 0


def test_youden_tie_prefers_smallest_threshold(spark):
    # uninformative scores: J = 0 everywhere -> smallest v wins
    rows = [(1, 1), (1, 0), (2, 1), (2, 0)]
    df = spark.createDataFrame(rows, "v long, y long")
    r = youden_cutoff(df, "v", "y").collect()[0]
    assert r["j"] == 0.0 and r["t_star"] == 1


def test_james_stein_shrinks_toward_grand_mean(spark):
    # 6 groups of 30 with distinct means and within-group spread
    rows = []
    for g in range(6):
        for i in range(30):
            rows.append((g, 100 + g * 10 + (i % 5)))
    df = spark.createDataFrame(rows, "g long, v long")
    out = {r["g"]: r for r in
           james_stein_means(df, "g", "v").collect()}
    raw = {g: 100 + g * 10 + 2 for g in range(6)}
    grand = sum(raw.values()) / 6
    for g in range(6):
        s = out[g]["shrunk_r"]
        assert s is not None
        # shrunk value sits between the raw mean and the grand mean
        lo, hi = sorted((raw[g], grand))
        assert lo - 1e-6 <= s <= hi + 1e-6
    # extreme groups move, and ordering is preserved
    assert out[0]["shrunk_r"] < out[5]["shrunk_r"]


def test_mahalanobis_flags_off_axis_point(spark):
    # tight correlated cloud + one off-axis outlier
    rows = [(i, i, i) for i in range(20)] + [(99, 0, 19)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    out = {r["i"]: r["md2_r"] for r in
           mahalanobis_2d(df, "x", "y", "i").collect()}
    on_axis = max(v for k, v in out.items() if k != 99)
    assert out[99] > 5 * on_axis
