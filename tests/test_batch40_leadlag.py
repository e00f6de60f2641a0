"""Batch-40 ops: cross-correlation function, Granger lag-1
causality, partial correlation."""

import pytest

from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# ccf
# ---------------------------------------------------------------------------


def test_ccf_detects_shift(spark):
    # y is x delayed by 2 steps: r peaks (=1 on the overlap) at lag 2
    xs = [1, 5, 2, 8, 3, 9, 4, 7, 6, 2, 8, 1]
    rows = [(1, t, xs[t], xs[t - 2] if t >= 2 else 0)
            for t in range(len(xs))]
    df = spark.createDataFrame(rows, ["k", "o", "x", "y"])
    out = {r.lag: r.r for r in ops_temporal.ccf(
        df, key="k", order="o", x="x", y="y", max_lag=4).collect()}
    assert out[2] == max(out.values())
    assert out[2] > 0.5


def test_ccf_lag0_is_pearson(spark):
    rows = [(1, t, t, 3 * t + 1) for t in range(10)]
    df = spark.createDataFrame(rows, ["k", "o", "x", "y"])
    out = {r.lag: r.r for r in ops_temporal.ccf(
        df, key="k", order="o", x="x", y="y", max_lag=2).collect()}
    assert out[0] == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# granger_lag1
# ---------------------------------------------------------------------------


def test_granger_x_causes_y(spark):
    # y_t = x_{t-1} + small noise: the unrestricted model is
    # near-perfect (exactly perfect would guard-NULL on RSS_u = 0),
    # the restricted one is not -> huge F
    xs = [(i * 7919 + 13) % 97 for i in range(40)]
    rows = [(1, t, xs[t], (xs[t - 1] if t >= 1 else 0) + t % 3)
            for t in range(40)]
    df = spark.createDataFrame(rows, ["k", "o", "x", "y"])
    r = ops_temporal.granger_lag1(
        df, key="k", order="o", x="x", y="y").collect()[0]
    assert r.f_stat is not None and r.f_stat > 100


def test_granger_independent_small_f(spark):
    rows = [(1, t, (t * 31 + 7) % 23, (t * 17 + 3) % 29)
            for t in range(60)]
    df = spark.createDataFrame(rows, ["k", "o", "x", "y"])
    r = ops_temporal.granger_lag1(
        df, key="k", order="o", x="x", y="y").collect()[0]
    assert r.f_stat is not None and r.f_stat < 10


def test_granger_short_series_null(spark):
    rows = [(1, t, t, t) for t in range(4)]  # n after lag = 3
    df = spark.createDataFrame(rows, ["k", "o", "x", "y"])
    r = ops_temporal.granger_lag1(
        df, key="k", order="o", x="x", y="y").collect()[0]
    assert r.f_stat is None


# ---------------------------------------------------------------------------
# partial_correlation
# ---------------------------------------------------------------------------


def test_partial_removes_common_driver(spark):
    # x = z + noise_a, y = z + noise_b with independent noises:
    # raw r_xy is strongly positive, partial r_xy.z collapses
    za = [(i * 13) % 40 for i in range(60)]
    na = [(i * 29 + 5) % 7 for i in range(60)]
    nb = [(i * 37 + 2) % 7 for i in range(60)]
    rows = [(1, za[i] + na[i], za[i] + nb[i], za[i])
            for i in range(60)]
    df = spark.createDataFrame(rows, ["k", "x", "y", "z"])
    r = ops_stats.partial_correlation(
        df, key="k", x="x", y="y", z="z").collect()[0]
    assert abs(r.r_xy_z) < 0.4


def test_partial_reference_value(spark):
    # independent Fraction/float cross-check on a tiny fixture
    rows = [(1, 2, 1, 0), (1, 4, 3, 1), (1, 5, 4, 1), (1, 8, 9, 3),
            (1, 9, 8, 3)]
    df = spark.createDataFrame(rows, ["k", "x", "y", "z"])
    import math

    xs = [2, 4, 5, 8, 9]
    ys = [1, 3, 4, 9, 8]
    zs = [0, 1, 1, 3, 3]

    def corr(a, b):
        n = len(a)
        ca = n * sum(x * y for x, y in zip(a, b)) - sum(a) * sum(b)
        va = n * sum(x * x for x in a) - sum(a) ** 2
        vb = n * sum(x * x for x in b) - sum(b) ** 2
        return ca / math.sqrt(va * vb)

    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    expect = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz ** 2) * (1 - ryz ** 2)
    )
    r = ops_stats.partial_correlation(
        df, key="k", x="x", y="y", z="z").collect()[0]
    assert r.r_xy_z == pytest.approx(expect, abs=1e-9)


def test_partial_perfect_confound_null(spark):
    rows = [(1, i, i + 1, i) for i in range(6)]  # r_xz = 1
    df = spark.createDataFrame(rows, ["k", "x", "y", "z"])
    r = ops_stats.partial_correlation(
        df, key="k", x="x", y="y", z="z").collect()[0]
    assert r.r_xy_z is None
