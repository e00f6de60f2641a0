"""Batch-46 op: chi-square independence + Cramér's V."""

import math

import pytest

from pdal_spark.operators import stats as ops_stats


def test_chi2_matches_direct_computation(spark):
    rows = ([("x", "p")] * 10 + [("x", "q")] * 20
            + [("y", "p")] * 30 + [("y", "q")] * 5)
    df = spark.createDataFrame(rows, ["a", "b"])
    r = ops_stats.chi_square_independence(df).collect()[0]
    O = [[10, 20], [30, 5]]
    n, R, C = 65, [30, 35], [40, 25]
    ref = sum(
        (O[i][j] - R[i] * C[j] / n) ** 2 / (R[i] * C[j] / n)
        for i in range(2) for j in range(2)
    )
    assert r.chi2 == pytest.approx(ref, abs=1e-4)
    assert r.cramers_v == pytest.approx(math.sqrt(ref / n), abs=1e-4)


def test_chi2_independent_table_near_zero(spark):
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(25)]
    df = spark.createDataFrame(rows, ["a", "b"])
    r = ops_stats.chi_square_independence(df).collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-4)


def test_chi2_absent_cells_counted(spark):
    # [[5, 0], [0, 5]]: perfect association, V = 1
    rows = [("x", "p")] * 5 + [("y", "q")] * 5
    df = spark.createDataFrame(rows, ["a", "b"])
    r = ops_stats.chi_square_independence(df).collect()[0]
    assert r.chi2 == pytest.approx(10.0, abs=1e-4)
    assert r.cramers_v == pytest.approx(1.0, abs=1e-4)


def test_chi2_single_category_null_v(spark):
    rows = [("x", "p")] * 5 + [("x", "q")] * 5
    df = spark.createDataFrame(rows, ["a", "b"])
    r = ops_stats.chi_square_independence(df).collect()[0]
    assert r.cramers_v is None
