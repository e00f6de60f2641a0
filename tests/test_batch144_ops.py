"""Invariant tests for batch 144: seasonal MK, Pettitt."""

from __future__ import annotations

from pdal_spark.operators.temporal import (
    pettitt_test,
    seasonal_mann_kendall,
)


def test_seasonal_mk_detects_within_season_trend(spark):
    # every season rises monotonically even though season levels
    # differ wildly (the case plain MK mangles)
    rows = []
    for s in range(4):
        for t in range(10):
            rows.append((s, s * 1000 + t, s * 500 + t))
    df = spark.createDataFrame(rows, "k long, o long, v long")
    r = seasonal_mann_kendall(df, "k", "o", "v").collect()[0]
    assert r["n_seasons"] == 4
    assert r["s"] == 4 * 45   # every pair concordant per season
    assert r["z"] > 3


def test_seasonal_mk_flat_is_zero(spark):
    rows = [(s, t, 7) for s in range(3) for t in range(8)]
    df = spark.createDataFrame(rows, "k long, o long, v long")
    r = seasonal_mann_kendall(df, "k", "o", "v").collect()[0]
    assert r["s"] == 0 and r["z"] is None  # all tied -> var 0


def test_pettitt_finds_level_shift(spark):
    series = [10] * 25 + [50] * 25
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(series)], "o long, v long"
    )
    r = pettitt_test(df, "o", "v").collect()[0]
    assert r["t_star"] == 25
    # K at the true split: sum of 25 low doubled-midranks minus
    # t(n+1): |25*26 - 25*51| = 625
    assert r["k_stat"] == 625


def test_pettitt_tie_prefers_earliest(spark):
    df = spark.createDataFrame(
        [(i, 5) for i in range(10)], "o long, v long"
    )
    r = pettitt_test(df, "o", "v").collect()[0]
    assert r["k_stat"] == 0 and r["t_star"] == 1
