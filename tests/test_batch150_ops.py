"""Invariant tests for batch 150: RMST, win ratio."""

from __future__ import annotations

from pdal_spark.operators.temporal import rmst, win_ratio


def test_rmst_textbook(spark):
    # events at t=2 (of 4 at risk) and t=5 (of 2 at risk);
    # censored at 3, 8: S=1 on [0,2), 0.75 on [2,5), 0.375 on
    # [5,10): RMST(10) = 2 + 3*0.75 + 5*0.375 = 6.125
    rows = [(2, 1), (3, 0), (5, 1), (8, 0)]
    df = spark.createDataFrame(rows, "t long, e int")
    r = rmst(df, "t", "e", tau=10).collect()[0]
    assert abs(r["rmst_r"] - 6.125) < 1e-5


def test_rmst_no_events_is_tau(spark):
    rows = [(9, 0), (12, 0)]
    df = spark.createDataFrame(rows, "t long, e int")
    r = rmst(df, "t", "e", tau=7).collect()[0]
    assert r["rmst_r"] == 7.0


def test_win_ratio_counts(spark):
    # A events late, B events early -> A wins most pairs
    a = spark.createDataFrame([(10, 1), (12, 0)], "t long, e int")
    b = spark.createDataFrame([(2, 1), (11, 1)], "t long, e int")
    r = win_ratio(a, b, "t", "e").collect()[0]
    # pairs: (10,b2):b fails first->A wins; (10,b11): a fails at
    # 10 < 11 -> B wins; (12,b2): A wins; (12,b11): b fails 11 <
    # 12 -> A wins
    assert r["wins_a"] == 3 and r["wins_b"] == 1
    assert r["wr"] == 3.0
