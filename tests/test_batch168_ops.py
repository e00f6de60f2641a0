"""Invariant tests for batch 168: distance decay, Hansen access."""

from __future__ import annotations

from pdal_spark.operators.stats import distance_decay, hansen_access


def test_distance_decay_recovers_exponent(spark):
    # plant f = 1e6 / d^2 exactly (d2 column carries d^2)
    rows = [(10 ** 6 // (d * d), d * d) for d in range(2, 40)]
    df = spark.createDataFrame(rows, "f long, dd long")
    r = distance_decay(df, "f", "dd").collect()[0]
    assert abs(r["beta"] - 2.0) < 0.05


def test_hansen_access_values(spark):
    d = spark.createDataFrame([(1, 0, 0)], "i long, x long, y long")
    s = spark.createDataFrame(
        [(10, 0, 100), (0, 10, 50)], "x long, y long, w long"
    )
    r = hansen_access(d, s, "i", "x", "y", "w").collect()[0]
    # 100/100 + 50/100 = 1.5
    assert abs(r["access"] - 1.5) < 1e-5
    assert r["n_supply"] == 2


def test_hansen_self_distance_clamped(spark):
    d = spark.createDataFrame([(1, 5, 5)], "i long, x long, y long")
    s = spark.createDataFrame([(5, 5, 7)], "x long, y long, w long")
    r = hansen_access(d, s, "i", "x", "y", "w").collect()[0]
    assert abs(r["access"] - 7.0) < 1e-5  # d2 clamped to 1
