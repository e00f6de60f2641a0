"""Invariant tests for batch 154: Watson-Williams, Mood median."""

from __future__ import annotations

from pdal_spark.operators.pointpattern import watson_williams
from pdal_spark.operators.stats import mood_median


def test_watson_williams_separated_directions(spark):
    # two tight groups 60 degrees apart -> large F; same-direction
    # groups -> tiny F
    far = [(0, 10 + d) for d in range(5)] + \
          [(1, 70 + d) for d in range(5)]
    near = [(0, 10 + d) for d in range(5)] + \
           [(1, 11 + d) for d in range(5)]
    df1 = spark.createDataFrame(far, "g long, b long")
    df2 = spark.createDataFrame(near, "g long, b long")
    f1 = watson_williams(df1, "g", "b").collect()[0]["f_r"]
    f2 = watson_williams(df2, "g", "b").collect()[0]["f_r"]
    assert f1 > 10 * max(f2, 1e-9)


def test_mood_median_shifted_group(spark):
    # group 0 all below the grand median, group 1 all above
    rows = [(0, v) for v in range(10)] + \
           [(1, 100 + v) for v in range(10)]
    df = spark.createDataFrame(rows, "g long, v long")
    r = mood_median(df, "g", "v").collect()[0]
    assert r["k"] == 2
    # maximal separation: chi2 = n = 20
    assert abs(r["chi2"] - 20.0) < 1e-3


def test_mood_median_identical_groups_zero(spark):
    rows = [(g, v) for g in range(2) for v in range(10)]
    df = spark.createDataFrame(rows, "g long, v long")
    r = mood_median(df, "g", "v").collect()[0]
    assert r["chi2"] < 1e-3
