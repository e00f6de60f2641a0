"""Batch-55 ops: knee-point detection, one-way ANOVA F."""

import pytest

from pdal_spark.operators import stats as ops_stats


def test_knee_at_visible_bend(spark):
    pts = [(1, 0, 0), (1, 1, 50), (1, 2, 80), (1, 3, 90),
           (1, 4, 95), (1, 5, 97)]
    df = spark.createDataFrame(pts, ["k", "x", "y"])
    r = ops_stats.knee_point(df, "k", "x", "y").collect()[0]
    assert (r.knee_x, r.knee_y) == (2, 80)


def test_knee_straight_line_zero_cross(spark):
    pts = [(1, x, 3 * x) for x in range(6)]
    df = spark.createDataFrame(pts, ["k", "x", "y"])
    r = ops_stats.knee_point(df, "k", "x", "y").collect()[0]
    assert r.cross_abs == 0
    # ties broken to the smallest x -> the first point
    assert r.knee_x == 0


def test_anova_matches_direct(spark):
    rows = [("a", 5), ("a", 6), ("a", 7), ("b", 10), ("b", 11),
            ("b", 12), ("c", 5), ("c", 9)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = ops_stats.anova_f(df, "g", "v").collect()[0]
    groups = {"a": [5, 6, 7], "b": [10, 11, 12], "c": [5, 9]}
    N, g = 8, 3
    m = sum(sum(v) for v in groups.values()) / N
    ssb = sum(len(v) * (sum(v) / len(v) - m) ** 2
              for v in groups.values())
    ssw = sum((x - sum(v) / len(v)) ** 2
              for v in groups.values() for x in v)
    ref = (ssb / (g - 1)) / (ssw / (N - g))
    assert r.f_stat == pytest.approx(ref, abs=1e-4)


def test_anova_identical_groups_small_f(spark):
    rows = [(g, v) for g in "abc" for v in (5, 6, 7)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = ops_stats.anova_f(df, "g", "v").collect()[0]
    assert r.f_stat == pytest.approx(0.0, abs=1e-6)


def test_anova_zero_within_variance_null(spark):
    rows = [("a", 5), ("a", 5), ("b", 9), ("b", 9)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = ops_stats.anova_f(df, "g", "v").collect()[0]
    assert r.f_stat is None
