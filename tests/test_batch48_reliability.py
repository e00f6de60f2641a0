"""Batch-48 ops: weighted kappa, one-way ICC, Cronbach's alpha —
each cross-checked against an independent direct computation."""

import pytest

from pdal_spark.operators import stats as ops_stats


def test_weighted_kappa_reference(spark):
    ratings = ([(0, 0)] * 5 + [(0, 1)] * 2 + [(1, 1)] * 4
               + [(2, 2)] * 3 + [(2, 0)] * 1)
    df = spark.createDataFrame(ratings, ["a", "b"])
    r = ops_stats.weighted_kappa(df, "a", "b", 3).collect()[0]
    import numpy as np

    O = np.zeros((3, 3))
    for a, b in ratings:
        O[a][b] += 1
    n, R, C = O.sum(), O.sum(1), O.sum(0)
    w = np.array([[(i - j) ** 2 for j in range(3)]
                  for i in range(3)])
    ref = 1 - n * (w * O).sum() / (w * np.outer(R, C)).sum()
    assert r.wkappa == pytest.approx(ref, abs=1e-12)


def test_weighted_kappa_perfect_agreement(spark):
    df = spark.createDataFrame(
        [(i % 3, i % 3) for i in range(9)], ["a", "b"]
    )
    r = ops_stats.weighted_kappa(df, "a", "b", 3).collect()[0]
    assert r.wkappa == 1.0 and r.wo == 0


def test_icc_reference(spark):
    data = {1: [9, 8, 9], 2: [2, 3, 2], 3: [5, 5, 6], 4: [8, 7, 9]}
    rows = [(i, v) for i, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, ["item", "y"])
    r = ops_stats.icc_oneway(df).collect()[0]
    g, k = 4, 3
    m = sum(sum(v) for v in data.values()) / (g * k)
    ssb = k * sum((sum(v) / k - m) ** 2 for v in data.values())
    ssw = sum((x - sum(v) / k) ** 2
              for v in data.values() for x in v)
    msb, msw = ssb / (g - 1), ssw / (g * (k - 1))
    ref = (msb - msw) / (msb + (k - 1) * msw)
    assert r.icc == pytest.approx(ref, abs=1e-12)


def test_icc_unbalanced_raises(spark):
    rows = [(1, 5), (1, 6), (2, 7)]
    df = spark.createDataFrame(rows, ["item", "y"])
    with pytest.raises(ValueError):
        ops_stats.icc_oneway(df)


def test_cronbach_reference(spark):
    import numpy as np

    rows = [(1, 2, 3), (2, 3, 4), (3, 4, 6), (4, 5, 7), (5, 7, 8)]
    df = spark.createDataFrame(rows, ["i1", "i2", "i3"])
    r = ops_stats.cronbach_alpha(df, ["i1", "i2", "i3"]).collect()[0]
    X = np.array(rows, dtype=float)
    ref = 3 / 2 * (1 - X.var(0).sum() / X.sum(1).var())
    assert r.alpha == pytest.approx(ref, abs=1e-12)


def test_cronbach_uncorrelated_items_low(spark):
    rows = [((i * 7) % 5, (i * 11 + 3) % 5, (i * 13 + 1) % 5)
            for i in range(40)]
    df = spark.createDataFrame(rows, ["i1", "i2", "i3"])
    r = ops_stats.cronbach_alpha(df, ["i1", "i2", "i3"]).collect()[0]
    assert r.alpha < 0.5
