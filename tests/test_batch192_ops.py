"""Invariant tests for batch 192: SRM check, SMD balance."""

from __future__ import annotations

from pdal_spark.operators.stats import smd_balance, srm_check


def test_srm_balanced_small_chi2(spark):
    rows = [(a,) for a in (0, 1) for _ in range(500)]
    df = spark.createDataFrame(rows, "a long")
    r = srm_check(df, "a").collect()[0]
    assert r["chi2"] < 0.01


def test_srm_mismatch_large(spark):
    rows = [(0,)] * 700 + [(1,)] * 300
    df = spark.createDataFrame(rows, "a long")
    r = srm_check(df, "a").collect()[0]
    # chi2 = (200^2/500)*2 = 160
    assert abs(r["chi2"] - 160.0) < 0.01


def test_smd_balance(spark):
    rows = [(0, v) for v in range(100)] \
        + [(1, v) for v in range(100)]
    df = spark.createDataFrame(rows, "g long, v long")
    assert abs(smd_balance(df, "g", "v").collect()[0]["smd"]) \
        < 1e-12
    shifted = [(0, v) for v in range(100)] \
        + [(1, v + 50) for v in range(100)]
    df2 = spark.createDataFrame(shifted, "g long, v long")
    r = smd_balance(df2, "g", "v").collect()[0]
    assert r["smd"] > 1.5
