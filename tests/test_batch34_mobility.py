"""Batch-34 ops: radius of gyration, bivariate Moran's I, spatial
Markov transitions, trajectory entropy."""

import math

import pytest

from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal
from pdal_spark.sqlgen import qcell_pack


def _cells(spark, vals, cols):
    rows = [(int(eval(qcell_pack(str(ix), str(iy), 4))), *v)
            for (ix, iy), v in vals.items()]
    return spark.createDataFrame(rows, ["cell"] + cols)

# ---------------------------------------------------------------------------
# radius_of_gyration
# ---------------------------------------------------------------------------


def test_rg_stationary_key_is_zero(spark):
    df = spark.createDataFrame(
        [(1, 500, 700)] * 5, ["k", "mx", "my"]
    )
    r = ops_temporal.radius_of_gyration(df, key="k").collect()[0]
    assert r.rg == 0.0 and r.rg2_n2 == 0


def test_rg_two_points_half_distance(spark):
    # two pings distance d apart -> rg = d/2
    df = spark.createDataFrame(
        [(1, 0, 0), (1, 10, 0)], ["k", "mx", "my"]
    )
    r = ops_temporal.radius_of_gyration(df, key="k").collect()[0]
    assert r.rg == pytest.approx(5.0, abs=1e-12)


def test_rg_square_pattern(spark):
    # 4 corners of a square side 2 -> rg = sqrt(2)
    df = spark.createDataFrame(
        [(1, 0, 0), (1, 2, 0), (1, 0, 2), (1, 2, 2)],
        ["k", "mx", "my"],
    )
    r = ops_temporal.radius_of_gyration(df, key="k").collect()[0]
    assert r.rg == pytest.approx(math.sqrt(2.0), abs=1e-12)


# ---------------------------------------------------------------------------
# bivariate_morans_i
# ---------------------------------------------------------------------------


def test_bivariate_equals_univariate_when_y_is_x(spark):
    vals = {(ix, iy): (v, v) for (ix, iy), v in
            {(0, 0): 1, (1, 0): 5, (0, 1): 2, (1, 1): 9}.items()}
    df = _cells(spark, vals, ["x", "y"])
    bi = ops_stats.bivariate_morans_i(df, res=4).collect()[0]
    uni = ops_stats.morans_i(
        df.select("cell", "x"), res=4).collect()[0]
    assert bi.bv_morans_i == pytest.approx(uni.morans_i, abs=1e-12)
    assert bi.den_x == bi.den_y == uni.den


def test_bivariate_sign_flips_with_negated_y(spark):
    base = {(0, 0): (1, 9), (1, 0): (5, 5), (0, 1): (2, 8),
            (1, 1): (9, 1)}
    df = _cells(spark, base, ["x", "y"])
    v = ops_stats.bivariate_morans_i(df, res=4).collect()[0]
    flipped = {k: (x, 10 - y) for k, (x, y) in base.items()}
    df2 = _cells(spark, flipped, ["x", "y"])
    v2 = ops_stats.bivariate_morans_i(df2, res=4).collect()[0]
    assert v.bv_morans_i == pytest.approx(-v2.bv_morans_i, abs=1e-12)


# ---------------------------------------------------------------------------
# spatial_markov
# ---------------------------------------------------------------------------


def test_spatial_markov_known_transitions(spark):
    # 3-cell row: counts double from t0 to t1; class_div 2,
    # 3 classes. v0 = (1, 3, 5) -> c0 = (0, 1, 2);
    # v1 = (2, 6, 10) -> c1 = (1, 2, 2 capped)
    t0 = _cells(spark, {(0, 0): (1,), (1, 0): (3,), (2, 0): (5,)},
                ["x"])
    t1 = _cells(spark, {(0, 0): (2,), (1, 0): (6,), (2, 0): (10,)},
                ["x"])
    out = ops_stats.spatial_markov(
        t0, t1, res=4, n_classes=3, class_div=2
    ).collect()
    trans = {(r.nbr_class, r.c0, r.c1): r.n_cells for r in out}
    # cell (0,0): nbr = {3} -> mean 3 -> class 1; 0 -> 1
    # cell (1,0): nbrs {1,5} -> mean 3 -> class 1; 1 -> 2
    # cell (2,0): nbr {3} -> class 1; 2 -> 2
    assert trans == {(1, 0, 1): 1, (1, 1, 2): 1, (1, 2, 2): 1}


def test_spatial_markov_requires_both_snapshots(spark):
    t0 = _cells(spark, {(0, 0): (1,), (1, 0): (3,)}, ["x"])
    t1 = _cells(spark, {(0, 0): (2,)}, ["x"])  # (1,0) missing at t1
    out = ops_stats.spatial_markov(
        t0, t1, res=4, n_classes=3, class_div=2
    ).collect()
    assert sum(r.n_cells for r in out) == 1


# ---------------------------------------------------------------------------
# trajectory_entropy
# ---------------------------------------------------------------------------


def test_trajectory_entropy_cyclic_is_low(spark):
    # strict A->B->A->B...: two bigrams each appearing m/2 times
    rows = [(1, t, "A" if t % 2 == 0 else "B") for t in range(9)]
    df = spark.createDataFrame(rows, ["k", "ts", "zone"])
    r = ops_temporal.trajectory_entropy(df, key="k").collect()[0]
    assert r.n_bigrams == 2 and r.m == 8
    assert r.entropy == pytest.approx(math.log(2), abs=1e-6)


def test_trajectory_entropy_constant_zone_zero(spark):
    rows = [(1, t, "A") for t in range(5)]
    df = spark.createDataFrame(rows, ["k", "ts", "zone"])
    r = ops_temporal.trajectory_entropy(df, key="k").collect()[0]
    assert r.entropy == pytest.approx(0.0, abs=1e-6)


def test_trajectory_entropy_single_ping_dropped(spark):
    df = spark.createDataFrame([(1, 1, "A")], ["k", "ts", "zone"])
    assert ops_temporal.trajectory_entropy(df, key="k").count() == 0
