"""Invariant tests for batch 132: Hodges-Lehmann, Bland-Altman."""

from __future__ import annotations

from pdal_spark.operators.stats import bland_altman, hodges_lehmann


def test_hodges_lehmann_pure_shift(spark):
    a = spark.createDataFrame([(v + 7,) for v in range(20)],
                              "v long")
    b = spark.createDataFrame([(v,) for v in range(20)], "v long")
    r = hodges_lehmann(a, b, "v").collect()[0]
    assert r["hl_shift"] == 7
    assert r["n_pairs"] == 400


def test_hodges_lehmann_resists_outlier(spark):
    a = spark.createDataFrame(
        [(v + 5,) for v in range(20)] + [(10000,)], "v long"
    )
    b = spark.createDataFrame([(v,) for v in range(20)], "v long")
    r = hodges_lehmann(a, b, "v").collect()[0]
    assert abs(r["hl_shift"] - 5) <= 1


def test_bland_altman_known_limits(spark):
    # constant difference -> sd 0, limits collapse on the bias
    df = spark.createDataFrame([(v, v - 3) for v in range(10)],
                               "x long, y long")
    r = bland_altman(df, "x", "y").collect()[0]
    assert r["bias"] == 3.0 and r["loa_lo"] == 3.0
    assert r["n_outside"] == 0


def test_bland_altman_flags_disagreement(spark):
    rows = [(v, v) for v in range(40)] + [(100, 0)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = bland_altman(df, "x", "y").collect()[0]
    assert r["n_outside"] >= 1
    assert r["loa_hi"] > r["bias"] > r["loa_lo"]
