"""Invariant tests for batch 134: Poisson rate test, funnel
limits."""

from __future__ import annotations

from pdal_spark.operators.stats import funnel_limits, poisson_rate_test


def test_poisson_rate_detects_doubled_rate(spark):
    # arm 0: 200 events over 100 exposure; arm 1: 100 over 100
    rows = [(0, 2, 1)] * 100 + [(1, 1, 1)] * 100
    df = spark.createDataFrame(rows, "g long, o long, t long")
    r = poisson_rate_test(df, "g", "o", "t", 0, 1).collect()[0]
    assert r["o_a"] == 200 and r["t_a"] == 100
    assert abs(r["irr"] - 2.0) < 1e-12
    assert r["z"] > 4
    assert r["irr_lo_r"] > 1.0  # significantly elevated


def test_poisson_rate_equal_rates_zero_z(spark):
    rows = [(0, 1, 1)] * 50 + [(1, 1, 1)] * 50
    df = spark.createDataFrame(rows, "g long, o long, t long")
    r = poisson_rate_test(df, "g", "o", "t", 0, 1).collect()[0]
    assert r["z"] == 0.0 and r["irr"] == 1.0


def test_funnel_flags_only_true_outlier(spark):
    # 9 entities at the pooled rate, one wildly above
    rows = []
    for e in range(9):
        rows += [(e, 1, 1)] * 20 + [(e, 0, 1)] * 80
    rows += [(9, 1, 1)] * 80 + [(9, 0, 1)] * 20
    df = spark.createDataFrame(rows, "e long, x long, t long")
    out = {r["e"]: r for r in funnel_limits(
        df, "e", "x", "t").collect()}
    assert out[9]["flag"] == 1
    assert sum(r["flag"] for r in out.values()) <= 2
    assert all(r["lo"] < r["hi"] for r in out.values())
