"""Batch-49 ops: capture-recapture, Chao1 richness, mark
correlation."""

import pytest

from pdal_spark.operators import sketch as ops_sketch
from pdal_spark.operators import stats as ops_stats


def test_capture_recapture_textbook(spark):
    # universe 100; A sees 0..49, B sees 25..74 -> m = 25
    a = spark.createDataFrame([(i,) for i in range(50)], ["id"])
    b = spark.createDataFrame([(i,) for i in range(25, 75)], ["id"])
    r = ops_sketch.capture_recapture(a, b).collect()[0]
    assert (r.n1, r.n2, r.m) == (50, 50, 25)
    assert r.lincoln_petersen == pytest.approx(100.0)
    assert r.chapman == pytest.approx(51 * 51 / 26 - 1)


def test_capture_recapture_disjoint_lp_null(spark):
    a = spark.createDataFrame([(1,), (2,)], ["id"])
    b = spark.createDataFrame([(3,), (4,)], ["id"])
    r = ops_sketch.capture_recapture(a, b).collect()[0]
    assert r.lincoln_petersen is None
    assert r.chapman == pytest.approx(3 * 3 / 1 - 1)


def test_chao1_all_unique_doubles_estimate(spark):
    # every element a singleton: chao1 = S + f1(f1-1)/2
    df = spark.createDataFrame([(i,) for i in range(10)], ["elem"])
    r = ops_sketch.chao1_richness(df).collect()[0]
    assert (r.s_obs, r.f1, r.f2) == (10, 10, 0)
    assert r.chao1 == pytest.approx(10 + 10 * 9 / 2)


def test_chao1_saturated_sample_adds_nothing(spark):
    rows = [(i % 5,) for i in range(50)]  # every element seen 10x
    df = spark.createDataFrame(rows, ["elem"])
    r = ops_sketch.chao1_richness(df).collect()[0]
    assert r.chao1 == pytest.approx(5.0)


def test_mark_correlation_brute_force(spark):
    import itertools

    pts = [(i, float(i), 0.0, i % 4 + 1) for i in range(12)]
    df = spark.createDataFrame(pts, ["pid", "lon", "lat", "mk"])
    out = {r.bin: (r.n_pairs, r.sum_mm) for r in
           ops_stats.mark_correlation(
               df, mark="mk", id_col="pid", bin_q=4, n_bins=4,
               coord_q=1,
           ).collect()}
    expect = {}
    for (i, xi, _, mi), (j, xj, _, mj) in itertools.combinations(
            pts, 2):
        d2 = int(xi - xj) ** 2
        if d2 == 0 or d2 > 16 * 16:
            continue
        b = next(k for k in range(4)
                 if k * k * 16 <= d2 < (k + 1) * (k + 1) * 16)
        n, s = expect.get(b, (0, 0))
        expect[b] = (n + 1, s + mi * mj)
    assert out == expect
