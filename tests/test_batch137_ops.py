"""Invariant tests for batch 137: VI, cluster purity."""

from __future__ import annotations

import math

from pdal_spark.operators.cluster import (
    cluster_purity,
    variation_information,
)


def test_vi_identical_partitions_zero(spark):
    rows = [(i % 4, (i % 4) * 7) for i in range(40)]
    df = spark.createDataFrame(rows, "a long, b long")
    assert variation_information(df, "a", "b").collect()[0]["vi"] \
        == 0.0


def test_vi_independent_positive(spark):
    rows = [(i % 2, i % 5) for i in range(100)]
    df = spark.createDataFrame(rows, "a long, b long")
    r = variation_information(df, "a", "b").collect()[0]
    # independent labels: VI = H(A) + H(B) = ln2 + ln5
    want = math.log(2) + math.log(5)
    assert abs(r["vi"] - want) < 5e-3


def test_cluster_purity_values(spark):
    # cluster 0: 3 x "a", 1 x "b"; cluster 1: 2 x "b"
    rows = [(0, "a")] * 3 + [(0, "b")] + [(1, "b")] * 2
    df = spark.createDataFrame(rows, "c long, t string")
    r = cluster_purity(df, "c", "t").collect()[0]
    assert r["sum_majority"] == 5 and r["n"] == 6
    assert abs(r["purity"] - 5 / 6) < 1e-12
