"""Invariant tests for batch 165: arc elasticity, retention
half-life."""

from __future__ import annotations

from pdal_spark.operators.temporal import (
    arc_elasticity,
    retention_half_life,
)


def test_arc_elasticity_unit_elastic(spark):
    # p: 10 -> 20, q: 20 -> 10: midpoint elasticity exactly -1
    rows = [(0, 10, 20), (1, 20, 10)]
    df = spark.createDataFrame(rows, "p long, pr0 long, q0 long")
    r = arc_elasticity(df, "p", "pr0", "q0").collect()[0]
    assert r["elasticity"] == -1.0


def test_arc_elasticity_flat_price_null(spark):
    rows = [(0, 10, 20), (1, 10, 30)]
    df = spark.createDataFrame(rows, "p long, pr0 long, q0 long")
    assert arc_elasticity(df, "p", "pr0",
                          "q0").collect()[0]["elasticity"] is None


def test_retention_half_life(spark):
    # cohort 0: 4 users; 3 at off 1, 1 at off 2 (< 50%) -> hl 2
    rows = [(u, 0) for u in range(4)] \
        + [(u, 1) for u in range(3)] + [(0, 2)]
    df = spark.createDataFrame(rows, "u long, p long")
    r = retention_half_life(df, "u", "p").collect()[0]
    assert r["cohort_size"] == 4 and r["half_life"] == 2


def test_retention_never_drops_null(spark):
    rows = [(u, p) for u in range(4) for p in range(3)]
    df = spark.createDataFrame(rows, "u long, p long")
    r = retention_half_life(df, "u", "p").collect()[0]
    assert r["half_life"] is None
