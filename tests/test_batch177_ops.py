"""Invariant tests for batch 177: GMD, Atkinson."""

from __future__ import annotations

import itertools

from pdal_spark.operators.stats import atkinson_index, gini_mean_diff


def test_gmd_matches_pairwise_definition(spark):
    vals = [1, 4, 9, 16, 25]
    df = spark.createDataFrame([(0, v) for v in vals],
                               "k long, v long")
    r = gini_mean_diff(df, "k", "v").collect()[0]
    n = len(vals)
    want = sum(abs(a - b) for a, b in
               itertools.combinations(vals, 2)) * 2 / (n * (n - 1))
    assert abs(r["gmd"] - want) < 1e-9


def test_gmd_constant_zero(spark):
    df = spark.createDataFrame([(0, 7)] * 5, "k long, v long")
    assert gini_mean_diff(df, "k", "v").collect()[0]["gmd"] == 0.0


def test_atkinson_equal_zero_unequal_positive(spark):
    eq = spark.createDataFrame([(0, 10)] * 6, "k long, v long")
    r = atkinson_index(eq, "k", "v").collect()[0]
    assert abs(r["a_r"]) < 1e-3
    uneq = spark.createDataFrame(
        [(0, 1)] * 5 + [(0, 1000)], "k long, v long"
    )
    r2 = atkinson_index(uneq, "k", "v").collect()[0]
    assert r2["a_r"] > 0.9
