"""Invariant tests for batch 102: Kendall tau-b, Kruskal-Wallis,
Brown-Forsythe."""

from __future__ import annotations

from pdal_spark.operators.stats import (
    brown_forsythe,
    kendall_tau,
    kruskal_wallis,
)


def test_kendall_tau_textbook(spark):
    # x=[1,2,3,4], y=[1,3,2,4]: one discordant pair -> tau = 4/6
    df = spark.createDataFrame(
        [(1, 1, 1), (2, 2, 3), (3, 3, 2), (4, 4, 4)],
        "i long, x long, y long",
    )
    r = kendall_tau(df, "x", "y", "i").collect()[0]
    assert (r["nc"], r["nd"]) == (5, 1)
    assert abs(r["tau_b"] - 4 / 6) < 1e-12


def test_kendall_tau_ties_and_reversal(spark):
    # perfect reversal -> -1; an x-tie drops into tx, not nc/nd
    df = spark.createDataFrame(
        [(1, 1, 9), (2, 2, 8), (3, 3, 7)], "i long, x long, y long"
    )
    assert kendall_tau(df, "x", "y", "i").collect()[0]["tau_b"] == -1.0
    df2 = spark.createDataFrame(
        [(1, 1, 1), (2, 1, 2), (3, 2, 3)], "i long, x long, y long"
    )
    r = df2, kendall_tau(df2, "x", "y", "i").collect()[0]
    assert r[1]["tx"] == 1 and r[1]["nc"] == 2
    # constant y -> denominator guard -> NULL
    df3 = spark.createDataFrame(
        [(1, 1, 5), (2, 2, 5)], "i long, x long, y long"
    )
    assert kendall_tau(df3, "x", "y", "i").collect()[0]["tau_b"] is None


def test_kruskal_wallis_textbook_no_ties(spark):
    # g1={1,2} g2={3,4} g3={5,6}: H = 12/42*(R^2/n sums) - 21
    rows = [(0, 1.0), (0, 2.0), (1, 3.0), (1, 4.0), (2, 5.0),
            (2, 6.0)]
    df = spark.createDataFrame(rows, "g long, v double")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r["n"] == 6 and r["k"] == 3 and r["tie3"] == 0
    assert abs(r["h"] - 32 / 7) < 1e-3      # 4.5714...
    assert abs(r["h_c"] - r["h"]) < 1e-12   # no ties -> C = 1


def test_kruskal_wallis_all_tied_is_null(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (1, 1.0)], "g long, v double"
    )
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r["h_c"] is None   # tie correction hits 0


def test_brown_forsythe_equal_spread_is_zero(spark):
    rows = [(0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3)]
    df = spark.createDataFrame(rows, "g long, x long")
    r = brown_forsythe(df, "g", "x").collect()[0]
    assert r["num_q"] == 0 and r["w"] == 0.0


def test_brown_forsythe_hand_computed(spark):
    # g0=[0,10,20], g1=[9,10,11]: W = 4 * 54 / 67.333 = 3.2079...
    rows = [(0, 0), (0, 10), (0, 20), (1, 9), (1, 10), (1, 11)]
    df = spark.createDataFrame(rows, "g long, x long")
    r = brown_forsythe(df, "g", "x").collect()[0]
    assert r["n"] == 6 and r["k"] == 2
    assert abs(r["w"] - 4 * 54.0 / (202.0 / 3.0)) < 1e-3
