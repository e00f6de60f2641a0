"""Invariant tests for batch 125: circular-linear correlation,
von Mises kappa."""

from __future__ import annotations

import math

from pdal_spark.operators.pointpattern import (
    circ_linear_corr,
    vonmises_kappa,
)


def test_circ_linear_planted_cosine_dependence(spark):
    rows = [(b, int(100 + 50 * math.cos(math.radians(b))))
            for b in range(0, 360, 5)]
    df = spark.createDataFrame(rows, "b long, x long")
    r = circ_linear_corr(df, "b", "x").collect()[0]
    assert r["r_xc"] > 0.99    # x rides cos
    assert abs(r["r_xs"]) < 0.05
    assert r["r2"] > 0.98


def test_circ_linear_independent_near_zero(spark):
    rows = [(b, (b * 7919) % 23) for b in range(0, 360, 3)]
    df = spark.createDataFrame(rows, "b long, x long")
    r = circ_linear_corr(df, "b", "x").collect()[0]
    assert r["r2"] < 0.1


def test_vonmises_tight_vs_uniform(spark):
    tight = [(0, b) for b in range(85, 96)]          # 11 deg spread
    spread = [(1, b) for b in range(0, 360, 10)]     # uniform
    df = spark.createDataFrame(tight + spread, "k long, b long")
    out = {r["k"]: r for r in
           vonmises_kappa(df, "k", "b").collect()}
    assert out[0]["kappa"] is not None
    assert out[0]["kappa"] > 50          # very concentrated
    assert out[1]["r_res"] < 0.05        # uniform -> R ~ 0
    assert out[1]["kappa"] < 0.2


def test_vonmises_saturation_guard(spark):
    df = spark.createDataFrame([(0, 45)] * 5, "k long, b long")
    r = vonmises_kappa(df, "k", "b").collect()[0]
    assert r["kappa"] is None  # R = 1 -> guarded NULL
