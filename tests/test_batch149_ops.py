"""Invariant tests for batch 149: price indices, HHI."""

from __future__ import annotations

import math

from pdal_spark.operators.stats import hhi_index, price_indices


def test_price_indices_uniform_inflation(spark):
    # every price doubles: L = P = F = 2 regardless of baskets
    rows = [(10, 3, 20, 5), (7, 2, 14, 1)]
    df = spark.createDataFrame(rows,
                               "p0 long, q0 long, p1 long, q1 long")
    r = price_indices(df, "p0", "q0", "p1", "q1").collect()[0]
    assert r["laspeyres"] == 2.0 and r["paasche"] == 2.0
    assert abs(r["fisher"] - 2.0) < 1e-12


def test_price_indices_fisher_between(spark):
    rows = [(10, 10, 20, 2), (10, 2, 11, 10)]
    df = spark.createDataFrame(rows,
                               "p0 long, q0 long, p1 long, q1 long")
    r = price_indices(df, "p0", "q0", "p1", "q1").collect()[0]
    lo, hi = sorted((r["laspeyres"], r["paasche"]))
    assert lo <= r["fisher"] <= hi
    assert abs(r["fisher"]
               - math.sqrt(r["laspeyres"] * r["paasche"])) < 1e-12


def test_hhi_bounds(spark):
    mono = spark.createDataFrame([(1, 100)], "e long, v long")
    assert hhi_index(mono, "e", "v").collect()[0]["hhi"] == 1.0
    even = spark.createDataFrame(
        [(i, 10) for i in range(4)], "e long, v long"
    )
    r = hhi_index(even, "e", "v").collect()[0]
    assert abs(r["hhi"] - 0.25) < 1e-12
