"""Invariant tests for batch 139: ABC classes, Lorenz points."""

from __future__ import annotations

from pdal_spark.operators.stats import abc_analysis, lorenz_points


def test_abc_classes(spark):
    # one whale (80), two mids (8, 7), rest tiny
    rows = [(1, 80), (2, 8), (3, 7), (4, 3), (5, 2)]
    df = spark.createDataFrame(rows, "e long, v long")
    out = {r["e"]: r["cls"] for r in
           abc_analysis(df, "e", "v").collect()}
    assert out[1] == "A"
    assert out[2] == "B" and out[3] == "B"
    assert out[4] == "C" and out[5] == "C"


def test_abc_exact_boundary_inclusive(spark):
    # cum exactly at 80% stays in A (<=)
    rows = [(1, 8), (2, 2)]
    df = spark.createDataFrame(rows, "e long, v long")
    out = {r["e"]: r["cls"] for r in
           abc_analysis(df, "e", "v").collect()}
    assert out[1] == "A"


def test_lorenz_uniform_is_diagonal(spark):
    df = spark.createDataFrame([(5,) for _ in range(100)], "v long")
    out = sorted(lorenz_points(df, "v").collect(),
                 key=lambda r: r["pt"])
    for r in out:
        assert abs(r["share"] - (r["pt"] + 1) / 10) < 1e-12


def test_lorenz_concentration_bows_down(spark):
    vals = [1] * 90 + [1000] * 10
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = sorted(lorenz_points(df, "v").collect(),
                 key=lambda r: r["pt"])
    # bottom 90% hold almost nothing
    assert out[8]["share"] < 0.01
    assert abs(out[9]["share"] - 1.0) < 1e-12
