"""Hand-built geometry fixtures for filters.estimaterank /
filters.approximatecoplanar (EstimateRankFilter.cpp:86,
ApproximateCoplanarFilter.cpp:117): collinear -> rank 1, planar ->
rank 2 + coplanar, full 3D spread -> rank 3 + not coplanar."""

from __future__ import annotations

from pdal_spark.operators.features3d import (
    approximate_coplanar,
    estimate_rank,
)


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y), float(z))
         for i, (x, y, z) in enumerate(pts)],
        "pid long, x double, y double, z double",
    )


def _kw(knn):
    return dict(knn=knn, radius0=50.0, x="x", y="y", z="z",
                id_col="pid")


def test_collinear_points_rank_1(spark):
    # 9 points on the line (t, 2t, 3t): one nonzero eigenvalue
    df = _df(spark, [(t, 2 * t, 3 * t) for t in range(9)])
    r = estimate_rank(df, **_kw(9)).toPandas()
    assert (r["rank"] == 1).all()


def test_planar_points_rank_2_and_coplanar(spark):
    # 3x3 grid on the plane z = x + y, clearly 2D spread
    pts = [(x, y, x + y) for x in range(3) for y in range(3)]
    df = _df(spark, pts)
    r = estimate_rank(df, **_kw(9)).toPandas()
    assert (r["rank"] == 2).all()
    c = approximate_coplanar(df, **_kw(9)).toPandas()
    assert (c["coplanar"] == 1).all()


def test_full_3d_rank_3_not_coplanar(spark):
    # isotropic-ish cloud: corners of a cube + center
    pts = [(x, y, z) for x in (0, 4) for y in (0, 4) for z in (0, 4)]
    pts.append((2, 2, 2))
    df = _df(spark, pts)
    r = estimate_rank(df, **_kw(9)).toPandas()
    assert (r["rank"] == 3).all()
    c = approximate_coplanar(df, **_kw(9)).toPandas()
    # cube spread: ev0 == ev1 == ev2 -> ev1 > 25*ev0 fails
    assert (c["coplanar"] == 0).all()


def test_identical_points_rank_0(spark):
    df = _df(spark, [(1.0, 2.0, 3.0)] * 6)
    r = estimate_rank(df, **_kw(6)).toPandas()
    assert (r["rank"] == 0).all()
