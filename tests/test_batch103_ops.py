"""Invariant tests for batch 103: Durbin-Watson, Ljung-Box, PACF."""

from __future__ import annotations

from pdal_spark.operators.temporal import (
    durbin_watson,
    ljung_box,
    pacf2,
)


def _series(spark, vals):
    return spark.createDataFrame(
        [(0, i, v) for i, v in enumerate(vals)],
        "k long, o long, v long",
    )


def test_durbin_watson_alternating_is_near_four(spark):
    # perfectly alternating series -> r1 ~ -1 -> DW ~ 4
    df = _series(spark, [0, 10, 0, 10, 0, 10, 0, 10])
    r = durbin_watson(df, "k", "o", "v").collect()[0]
    assert r["dw"] > 3.4


def test_durbin_watson_trend_is_near_zero(spark):
    # smooth ramp -> strong positive r1 -> DW << 2
    df = _series(spark, list(range(20)))
    r = durbin_watson(df, "k", "o", "v").collect()[0]
    assert r["dw"] < 0.2


def test_ljung_box_detects_autocorrelation(spark):
    ramp = ljung_box(_series(spark, list(range(30))),
                     "k", "o", "v").collect()[0]
    # de-meaned ramp: r1 ~ 0.9 -> Q large
    assert ramp["q_lb"] > 20
    # constant series: c0 = 0 -> NULL guard
    flat = ljung_box(_series(spark, [5] * 10),
                     "k", "o", "v").collect()[0]
    assert flat["q_lb"] is None


def test_pacf_ar1_has_small_phi22(spark):
    # AR(1)-like doubling-decay series: phi22 ~ 0 after removing
    # the lag-1 channel, while phi11 is large
    vals = [64, 32, 16, 8, 4, 2, 1, 0, 64, 32, 16, 8, 4, 2, 1, 0]
    r = pacf2(_series(spark, vals), "k", "o", "v").collect()[0]
    assert r["phi11"] is not None and r["phi22"] is not None
    assert abs(r["phi22"]) < abs(r["phi11"])


def test_pacf_moments_match_definition(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    r = pacf2(_series(spark, vals), "k", "o", "v").collect()[0]
    n = len(vals)
    s = sum(vals)
    d = [n * v - s for v in vals]
    assert r["c0"] == sum(x * x for x in d)
    assert r["c1"] == sum(d[i] * d[i - 1] for i in range(1, n))
    assert r["c2"] == sum(d[i] * d[i - 2] for i in range(2, n))
