"""Invariant tests for batch 107: G function, Gcross, Kcross."""

from __future__ import annotations

from pdal_spark.operators.stats import cross_g, cross_k, g_function


def _df(spark, pts, name="pid"):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        f"{name} long, lon double, lat double",
    )


def test_g_function_two_clusters(spark):
    # two tight pairs far apart: every NN distance is 1 grid unit
    pts = [(0.0, 0.0), (0.001, 0.0), (50.0, 0.0), (50.001, 0.0)]
    out = {r["r_q"]: r for r in g_function(
        _df(spark, pts), radii_q=[2, 10000], id_col="pid",
        coord_q=1 << 10,
    ).collect()}
    assert out[2]["n_le"] == 4 and out[2]["g_hat"] == 1.0
    assert out[10000]["n_le"] == 4


def test_g_function_censors_beyond_ladder(spark):
    # isolated point: NN beyond max radius -> appears in n, not n_le
    pts = [(0.0, 0.0), (0.001, 0.0), (80.0, 0.0)]
    out = {r["r_q"]: r for r in g_function(
        _df(spark, pts), radii_q=[4], id_col="pid", coord_q=1 << 10,
    ).collect()}
    assert out[4]["n"] == 3 and out[4]["n_le"] == 2


def test_cross_g_and_k_ladder(spark):
    left = _df(spark, [(0.0, 0.0), (10.0, 0.0)])
    right = _df(spark, [(0.001, 0.0), (0.002, 0.0)])
    gg = {r["r_q"]: r for r in cross_g(
        left, right, radii_q=[3, 20000], id_left="pid",
        id_right="pid", coord_q=1 << 10,
    ).collect()}
    # left point 0 has a type-2 neighbour within 3 units; point at
    # x=10 only reaches one at the 20000 rung
    assert gg[3]["n_le"] == 1
    assert gg[20000]["n_le"] == 2 and gg[20000]["g12_hat"] == 1.0
    kk = {r["r_q"]: r["n_pairs"] for r in cross_k(
        left, right, radii_q=[3, 20000], id_left="pid",
        id_right="pid", coord_q=1 << 10,
    ).collect()}
    assert kk[3] == 2      # both type-2 points near left point 0
    assert kk[20000] == 4  # all ordered cross pairs
