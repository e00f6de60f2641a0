"""Invariant tests for batch 105: IV-Wald, Friedman, Page trend."""

from __future__ import annotations

from pdal_spark.operators.stats import (
    friedman_test,
    iv_wald,
    page_trend,
)


def test_iv_wald_recovers_structural_beta(spark):
    # x = 2z + confounder c; y = 3x + 10c: OLS of y on x is biased
    # by c, but z is clean -> beta_iv = 3 exactly
    rows = []
    for i in range(40):
        z = i % 2
        c = i % 5
        x = 2 * z + c
        y = 3 * x + 10 * c
        rows.append((z, x, y))
    df = spark.createDataFrame(rows, "zv long, xv long, yv long")
    r = iv_wald(df, "zv", "xv", "yv").collect()[0]
    # cov(z,y)/cov(z,x) = (3*cov(z,x) + 10*cov(z,c)) / cov(z,x);
    # z and c are independent over this grid -> exactly 3
    assert abs(r["beta_iv"] - 3.0) < 1e-9
    assert r["pi"] is not None and abs(r["pi"] - 2.0) < 1e-9


def test_iv_wald_irrelevant_instrument_null(spark):
    rows = [(1, 5, 9), (0, 5, 7), (1, 5, 3), (0, 5, 1)]
    df = spark.createDataFrame(rows, "zv long, xv long, yv long")
    assert iv_wald(df, "zv", "xv", "yv").collect()[0]["beta_iv"] \
        is None


def test_friedman_textbook(spark):
    # 3 blocks x 3 treatments, treatment 3 always best, no ties:
    # ranks per block are (1,2,3) -> R = [3,6,9]
    rows = []
    for i in range(3):
        rows += [(i, 1, 10 + i), (i, 2, 20 + i), (i, 3, 30 + i)]
    df = spark.createDataFrame(rows, "i long, j long, v long")
    r = friedman_test(df, "i", "j", "v").collect()[0]
    # classic: chi2 = 12/(n k (k+1)) * sum R^2 - 3n(k+1) = 6
    assert abs(r["chi2"] - 6.0) < 1e-9


def test_friedman_all_tied_null(spark):
    rows = [(i, j, 7) for i in range(3) for j in (1, 2)]
    df = spark.createDataFrame(rows, "i long, j long, v long")
    assert friedman_test(df, "i", "j", "v").collect()[0]["chi2"] \
        is None


def test_page_trend_monotone_is_max(spark):
    # perfectly increasing in j: L = n * sum j*j = max possible
    rows = [(i, j, j) for i in range(4) for j in (1, 2, 3)]
    df = spark.createDataFrame(rows, "i long, j long, v long")
    r = page_trend(df, "i", "j", "v").collect()[0]
    assert r["l"] == 4 * (1 * 1 + 2 * 2 + 3 * 3)
