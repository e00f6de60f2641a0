"""Invariant tests for batch 157: exponential GOF, Fano factor."""

from __future__ import annotations

from pdal_spark.operators.temporal import exp_gof, fano_factor


def test_exp_gof_regular_gaps_large_d(spark):
    # perfectly regular events: far from exponential -> D large
    ev_pos = set(range(0, 100, 10))
    rows = [(i, 1 if i in ev_pos else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "o long, ev int")
    r = exp_gof(df, "o", "ev").collect()[0]
    assert r["n_gaps"] == 9 and r["sum_gaps"] == 90
    # all gaps = 10: F_emp(10) = 1 vs 1 - e^-1 ~ 0.63
    assert r["d_stat_r"] > 0.3


def test_fano_regular_below_one_bursty_above(spark):
    regular = [(i * 10,) for i in range(100)]
    bursty = [(i,) for i in range(100)] \
        + [(5000 + i,) for i in range(100)]
    d1 = spark.createDataFrame(regular, "o long")
    d2 = spark.createDataFrame(bursty, "o long")
    f1 = fano_factor(d1, "o", window_w=50).collect()[0]["fano"]
    f2 = fano_factor(d2, "o", window_w=50).collect()[0]["fano"]
    assert f1 < 0.5          # regular
    assert f2 > 5            # two dense bursts among empty bins
