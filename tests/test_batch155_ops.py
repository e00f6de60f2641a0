"""Invariant tests for batch 155: info gain, attributable
fraction."""

from __future__ import annotations

import math

from pdal_spark.operators.stats import (
    attributable_fraction,
    info_gain,
)


def test_info_gain_perfect_predictor(spark):
    rows = [(v, v % 2) for v in range(4)] * 10
    df = spark.createDataFrame(rows, "x long, y long")
    r = info_gain(df, "x", "y").collect()[0]
    # feature determines the label: IG = H(y) = ln 2; SU > 0.5
    assert abs(r["ig"] - math.log(2)) < 5e-3
    assert r["su"] > 0.5


def test_info_gain_independent_zero(spark):
    rows = [(x, y) for x in range(4) for y in range(2)] * 5
    df = spark.createDataFrame(rows, "x long, y long")
    r = info_gain(df, "x", "y").collect()[0]
    assert abs(r["ig"]) < 5e-3


def test_attributable_fraction_known(spark):
    # unexposed risk 0.1 (10/100), overall risk 0.2 (30/150)
    rows = [(1, 1)] * 20 + [(1, 0)] * 30 \
        + [(0, 1)] * 10 + [(0, 0)] * 90
    df = spark.createDataFrame(rows, "e long, y long")
    r = attributable_fraction(df, "e", "y").collect()[0]
    assert r["a"] == 20 and r["c"] == 10
    assert abs(r["paf"] - (1 - 0.1 / 0.2)) < 1e-12


def test_attributable_fraction_no_effect_zero(spark):
    rows = [(1, 1)] * 5 + [(1, 0)] * 5 + [(0, 1)] * 5 \
        + [(0, 0)] * 5
    df = spark.createDataFrame(rows, "e long, y long")
    assert abs(attributable_fraction(df, "e", "y")
               .collect()[0]["paf"]) < 1e-12
