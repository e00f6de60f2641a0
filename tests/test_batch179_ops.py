"""Invariant tests for batch 179: SAR exponent, rarefaction."""

from __future__ import annotations

from pdal_spark.operators.textops import (
    rarefaction_expected,
    sar_exponent,
)


def test_sar_disjoint_parts_z_one(spark):
    # every part has its own disjoint 5 species: doubling area
    # doubles richness -> z = 1
    rows = [(p, p * 10 + s) for p in range(8) for s in range(5)]
    df = spark.createDataFrame(rows, "p long, sp long")
    r = sar_exponent(df, "p", "sp", levels=3).collect()[0]
    assert abs(r["z"] - 1.0) < 0.01


def test_sar_shared_species_z_zero(spark):
    rows = [(p, s) for p in range(8) for s in range(5)]
    df = spark.createDataFrame(rows, "p long, sp long")
    r = sar_exponent(df, "p", "sp", levels=3).collect()[0]
    assert abs(r["z"]) < 0.01


def test_rarefaction_bounds_and_singletons(spark):
    # 20 singleton species, subsample of 10 -> E[S_10] = 10
    rows = [(s,) for s in range(20)]
    df = spark.createDataFrame(rows, "sp long")
    r = rarefaction_expected(df, "sp", m=10).collect()[0]
    assert abs(r["e_sm"] - 10.0) < 1e-4
    # one dominant species -> E close to small
    rows2 = [(0,)] * 100 + [(1,)]
    df2 = spark.createDataFrame(rows2, "sp long")
    r2 = rarefaction_expected(df2, "sp", m=10).collect()[0]
    assert 1.0 < r2["e_sm"] < 1.2
