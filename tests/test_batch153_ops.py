"""Invariant tests for batch 153: Qn scale, shorth."""

from __future__ import annotations

import itertools

from pdal_spark.operators.stats import qn_scale, shorth_location


def test_qn_matches_definition(spark):
    vals = [1, 3, 6, 10, 15, 2, 8]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = qn_scale(df, "v").collect()[0]
    n = len(vals)
    h = n // 2 + 1
    k = h * (h - 1) // 2
    dists = sorted(abs(a - b) for a, b in
                   itertools.combinations(vals, 2))
    assert r["k_pick"] == k
    assert r["qn_raw"] == dists[k - 1]


def test_qn_resists_outliers(spark):
    base = [10, 11, 12, 13, 14, 15]
    df1 = spark.createDataFrame([(v,) for v in base], "v long")
    df2 = spark.createDataFrame(
        [(v,) for v in base[:-1] + [10000]], "v long"
    )
    q1 = qn_scale(df1, "v").collect()[0]["qn_raw"]
    q2 = qn_scale(df2, "v").collect()[0]["qn_raw"]
    assert q2 <= 3 * q1  # one wild value barely moves Qn


def test_shorth_finds_the_bulk(spark):
    # tight cluster at ~100 plus scattered junk
    vals = [98, 99, 100, 101, 102, 5, 500, 900]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = shorth_location(df, "v").collect()[0]
    assert r["h"] == 5
    assert 2 * 95 <= r["shorth2"] <= 2 * 105
    assert r["width"] <= 97  # the 5-wide run beats any junk span
