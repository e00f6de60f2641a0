"""Invariant tests for batch 121: adjusted Rand, CH index,
rectangle union area."""

from __future__ import annotations

from pdal_spark.operators.cluster import (
    adjusted_rand,
    calinski_harabasz,
)
from pdal_spark.operators.crop import rect_union_area


def test_adjusted_rand_identical_is_one(spark):
    rows = [(i % 3, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "a long, b long")
    assert adjusted_rand(df, "a", "b").collect()[0]["ari"] == 1.0


def test_adjusted_rand_permuted_labels_still_one(spark):
    rows = [(i % 3, (i % 3 + 1) % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "a long, b long")
    assert adjusted_rand(df, "a", "b").collect()[0]["ari"] == 1.0


def test_adjusted_rand_independent_near_zero(spark):
    rows = [(i % 2, i % 5) for i in range(40)]
    df = spark.createDataFrame(rows, "a long, b long")
    r = adjusted_rand(df, "a", "b").collect()[0]
    assert abs(r["ari"]) < 0.15


def test_calinski_harabasz_separated_beats_mixed(spark):
    tight = [(0, x, y) for x in range(3) for y in range(3)] \
        + [(1, 100 + x, 100 + y) for x in range(3) for y in range(3)]
    mixed = [(i % 2, x, y) for i, (x, y) in enumerate(
        (x, y) for x in range(6) for y in range(3))]
    d1 = spark.createDataFrame(tight, "g long, px long, py long")
    d2 = spark.createDataFrame(mixed, "g long, px long, py long")
    ch1 = calinski_harabasz(d1, "g", "px", "py").collect()[0]["ch"]
    ch2 = calinski_harabasz(d2, "g", "px", "py").collect()[0]["ch"]
    assert ch1 > 100 * ch2


def test_rect_union_area_hand_cases(spark):
    # two overlapping squares + one disjoint
    rows = [(0, 10, 0, 10), (5, 15, 0, 10), (100, 110, 100, 105)]
    df = spark.createDataFrame(
        rows, "x0 long, x1 long, y0 long, y1 long"
    )
    r = rect_union_area(df).collect()[0]
    assert r["area"] == 150 + 50  # 15x10 union + 10x5
    # full containment adds nothing
    rows2 = [(0, 10, 0, 10), (2, 8, 2, 8)]
    df2 = spark.createDataFrame(
        rows2, "x0 long, x1 long, y0 long, y1 long"
    )
    assert rect_union_area(df2).collect()[0]["area"] == 100
