"""Invariant tests for batch 180: Horvitz-Thompson, design
effect."""

from __future__ import annotations

from pdal_spark.operators.stats import design_effect, horvitz_thompson


def test_ht_equal_probability_scales_total(spark):
    # pi = 1/5 for all: T_hat = 5 * sample total
    rows = [(v, 1, 5) for v in (2, 3, 5)]
    df = spark.createDataFrame(rows, "v long, num long, den long")
    r = horvitz_thompson(df, "v", "num", "den").collect()[0]
    assert abs(r["t_hat"] - 50.0) < 1e-5


def test_ht_mixed_probabilities(spark):
    rows = [(10, 1, 2), (10, 1, 10)]  # pi = .5 and .1
    df = spark.createDataFrame(rows, "v long, num long, den long")
    r = horvitz_thompson(df, "v", "num", "den").collect()[0]
    assert abs(r["t_hat"] - (20.0 + 100.0)) < 1e-5


def test_design_effect_clustered_above_one(spark):
    # strong cluster separation -> DEFF >> 1
    rows = [(c, c * 100 + (i % 3)) for c in range(10)
            for i in range(20)]
    df = spark.createDataFrame(rows, "c long, v long")
    r = design_effect(df, "c", "v").collect()[0]
    assert r["deff"] > 10
    # IDENTICAL clusters sit at the anti-clustered bound
    # rho = -1/(m-1) -> DEFF -> 0
    rows2 = [(c, i % 7) for c in range(10) for i in range(20)]
    df2 = spark.createDataFrame(rows2, "c long, v long")
    r2 = design_effect(df2, "c", "v").collect()[0]
    assert abs(r2["deff"]) < 0.01
