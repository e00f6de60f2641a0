"""Batch-47 ops: G-test, odds ratio, McNemar."""

import math

import pytest

from pdal_spark.operators import stats as ops_stats


def test_g_test_matches_direct(spark):
    rows = ([("x", "p")] * 10 + [("x", "q")] * 20
            + [("y", "p")] * 30 + [("y", "q")] * 5)
    df = spark.createDataFrame(rows, ["a", "b"])
    r = ops_stats.g_test(df).collect()[0]
    O = {("x", "p"): 10, ("x", "q"): 20, ("y", "p"): 30,
         ("y", "q"): 5}
    n, R, C = 65, {"x": 30, "y": 35}, {"p": 40, "q": 25}
    ref = 2 * sum(
        o * math.log(n * o / (R[a] * C[b]))
        for (a, b), o in O.items()
    )
    assert r.g_stat == pytest.approx(ref, abs=1e-4)


def test_g_test_independent_near_zero(spark):
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(25)]
    df = spark.createDataFrame(rows, ["a", "b"])
    r = ops_stats.g_test(df).collect()[0]
    assert r.g_stat == pytest.approx(0.0, abs=1e-4)


def test_odds_ratio_known(spark):
    rows = ([(1, 1)] * 20 + [(1, 0)] * 10
            + [(0, 1)] * 5 + [(0, 0)] * 40)
    df = spark.createDataFrame(rows, ["exposed", "is_case"])
    r = ops_stats.odds_ratio(df).collect()[0]
    assert r.or_est == pytest.approx(20 * 40 / (10 * 5))
    assert r.log_se == pytest.approx(
        math.sqrt(1 / 20 + 1 / 10 + 1 / 5 + 1 / 40), abs=1e-12
    )


def test_odds_ratio_zero_cell_null(spark):
    rows = [(1, 1)] * 3 + [(0, 0)] * 3
    df = spark.createDataFrame(rows, ["exposed", "is_case"])
    r = ops_stats.odds_ratio(df).collect()[0]
    assert r.or_est is None


def test_mcnemar_known(spark):
    # 6 x-only, 2 y-only -> (6-2)^2/8 = 2
    rows = ([(1, 0)] * 6 + [(0, 1)] * 2 + [(1, 1)] * 5
            + [(0, 0)] * 7)
    df = spark.createDataFrame(rows, ["x", "y"])
    r = ops_stats.mcnemar_test(df).collect()[0]
    assert (r.b, r.c) == (6, 2)
    assert r.mcnemar_chi2 == pytest.approx(2.0)


def test_mcnemar_no_discordance_null(spark):
    rows = [(1, 1)] * 4 + [(0, 0)] * 4
    df = spark.createDataFrame(rows, ["x", "y"])
    r = ops_stats.mcnemar_test(df).collect()[0]
    assert r.mcnemar_chi2 is None
