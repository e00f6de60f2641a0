"""Invariant tests for batch 148: Erlang-C, concurrency stats."""

from __future__ import annotations

from pdal_spark.operators.stats import erlang_c
from pdal_spark.operators.temporal import concurrency_stats


def test_erlang_c_known_value(spark):
    # a = 2, c = 3: P(wait) = (8/6 * 3)/ (1 + 2 + 2 + 8/6*3) = 4/9
    df = spark.createDataFrame([(20, 10, 3)],
                               "lam long, mu long, c long")
    r = erlang_c(df, "lam", "mu", "c").collect()[0]
    assert abs(r["load_r"] - 2.0) < 1e-9
    assert abs(r["p_wait_r"] - 4 / 9) < 1e-6


def test_erlang_c_overload_is_one(spark):
    df = spark.createDataFrame([(50, 10, 3)],
                               "lam long, mu long, c long")
    assert erlang_c(df, "lam", "mu", "c").collect()[0]["p_wait_r"] \
        == 1.0


def test_concurrency_peak_and_avg(spark):
    # [0,10), [5,15), [5,7): peak 3 in [5,7)
    rows = [(0, 10), (5, 15), (5, 7)]
    df = spark.createDataFrame(rows, "st long, en long")
    r = concurrency_stats(df, "st", "en").collect()[0]
    assert r["peak"] == 3
    assert r["span"] == 15 and r["sum_dur"] == 22
    assert abs(r["avg_live"] - 22 / 15) < 1e-12


def test_concurrency_touching_do_not_overlap(spark):
    rows = [(0, 5), (5, 10)]
    df = spark.createDataFrame(rows, "st long, en long")
    assert concurrency_stats(df, "st", "en").collect()[0]["peak"] \
        == 1
