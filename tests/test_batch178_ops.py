"""Invariant tests for batch 178: income share ratios."""

from __future__ import annotations

from pdal_spark.operators.stats import income_share_ratios


def test_income_shares_uniform(spark):
    # equal values: top10 = 10% of total, bot40 = 40% -> palma .25
    df = spark.createDataFrame([(0, 10)] * 10, "k long, v long")
    r = income_share_ratios(df, "k", "v").collect()[0]
    assert r["bot40"] == 40 and r["top10"] == 10
    assert abs(r["palma"] - 0.25) < 1e-12
    assert r["s80s20"] == 1.0


def test_income_shares_concentrated(spark):
    vals = [1] * 9 + [1000]
    df = spark.createDataFrame([(0, v) for v in vals],
                               "k long, v long")
    r = income_share_ratios(df, "k", "v").collect()[0]
    assert r["top10"] == 1000 and r["bot40"] == 4
    assert r["palma"] == 250.0
