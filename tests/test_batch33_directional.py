"""Batch-33 ops: circular statistics, directional semivariogram,
Albers reprojection, spherical perimeter."""

import math

import pytest

from pdal_spark.operators import features as ops_features
from pdal_spark.operators import pointpattern as ops_pp
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import transform as ops_transform

# ---------------------------------------------------------------------------
# circular_stats
# ---------------------------------------------------------------------------


def test_circular_mean_wraps_zero(spark):
    df = spark.createDataFrame(
        [(1, 350.0), (1, 10.0)], ["k", "bearing"]
    )
    r = ops_pp.circular_stats(df, key="k").collect()[0]
    assert r.mean_dir == pytest.approx(0.0, abs=1e-5)
    assert r.r_len == pytest.approx(math.cos(math.radians(10.0)),
                                    abs=1e-6)


def test_circular_opposite_bearings_cancel(spark):
    df = spark.createDataFrame(
        [(1, 90.0), (1, 270.0)], ["k", "bearing"]
    )
    r = ops_pp.circular_stats(df, key="k").collect()[0]
    assert r.r_len < 1e-6 and r.circ_var > 1 - 1e-6


def test_circular_constant_bearing_r_one(spark):
    df = spark.createDataFrame(
        [(1, 123.0)] * 4, ["k", "bearing"]
    )
    r = ops_pp.circular_stats(df, key="k").collect()[0]
    assert r.r_len == pytest.approx(1.0, abs=1e-6)
    assert r.mean_dir == pytest.approx(123.0, abs=1e-5)


# ---------------------------------------------------------------------------
# semivariogram_directional
# ---------------------------------------------------------------------------


def test_directional_variogram_sectors(spark):
    # E-W line -> sector 0 pairs only; N-S line -> sector 2 only
    rows = [(i, float(i), 0.0, float(i)) for i in range(4)]
    rows += [(10 + i, 0.0, float(i) + 10.0, float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, ["pid", "lon", "lat", "value"])
    out = ops_stats.semivariogram_directional(
        df, value="value", id_col="pid", bin_q=1 << 12, n_bins=4,
        coord_q=1, value_q=1,
    ).collect()
    sectors = {r.sector for r in out}
    assert sectors <= {0, 2}
    n_by_sector = {}
    for r in out:
        n_by_sector[r.sector] = n_by_sector.get(r.sector, 0) + r.n_pairs
    # lines overlap in x/y ranges, so cross-line pairs add diagonal-
    # free counts; within-line pairs: 6 each
    assert n_by_sector.get(0, 0) >= 6 and n_by_sector.get(2, 0) >= 6


def test_directional_variogram_diagonal_sector(spark):
    rows = [(i, float(i), float(i), 0.0) for i in range(3)]
    df = spark.createDataFrame(rows, ["pid", "lon", "lat", "value"])
    out = ops_stats.semivariogram_directional(
        df, value="value", id_col="pid", bin_q=1 << 12, n_bins=4,
        coord_q=1, value_q=1,
    ).collect()
    assert {r.sector for r in out} == {1}
    assert sum(r.n_pairs for r in out) == 3


# ---------------------------------------------------------------------------
# reproject_albers
# ---------------------------------------------------------------------------


def test_albers_origin_maps_to_zero(spark):
    df = spark.createDataFrame([(23.0, -96.0)], ["lat", "lon"])
    r = ops_transform.reproject_albers(df).collect()[0]
    assert r.x_aea == pytest.approx(0.0, abs=1e-3)
    assert r.y_aea == pytest.approx(0.0, abs=1e-3)


def test_albers_is_equal_area_between_parallels(spark):
    # area scale: equal-area projections preserve area. Check a
    # small quad's planar area ~ its spherical area (R=6371008.8).
    pts = [(40.0, -100.0), (40.0, -99.0), (41.0, -99.0),
           (41.0, -100.0)]
    df = spark.createDataFrame(pts, ["lat", "lon"])
    rows = {(r.lat, r.lon): (r.x_aea, r.y_aea)
            for r in ops_transform.reproject_albers(df).collect()}
    xy = [rows[p] for p in pts]
    shoelace = 0.5 * abs(sum(
        xy[i][0] * xy[(i + 1) % 4][1] - xy[(i + 1) % 4][0] * xy[i][1]
        for i in range(4)
    ))
    R = 6371008.8
    sph = (R ** 2 * math.radians(1.0)
           * (math.sin(math.radians(41.0))
              - math.sin(math.radians(40.0))))
    assert shoelace == pytest.approx(sph, rel=2e-4)


def test_albers_north_is_up(spark):
    df = spark.createDataFrame(
        [(30.0, -96.0), (45.0, -96.0)], ["lat", "lon"]
    )
    rows = {r.lat: r.y_aea
            for r in ops_transform.reproject_albers(df).collect()}
    assert rows[45.0] > rows[30.0]


# ---------------------------------------------------------------------------
# spherical_perimeter
# ---------------------------------------------------------------------------


def _hav_km(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = p2 - p1
    dlam = math.radians(lon2 - lon1)
    h = (math.sin(dphi / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dlam / 2) ** 2)
    return 2 * 6371.0088 * math.asin(math.sqrt(h))


def test_spherical_perimeter_unit_square(spark):
    quad = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    rows = [(7, i, lon, lat) for i, (lon, lat) in enumerate(quad)]
    df = spark.createDataFrame(rows, ["poly_id", "seq", "lon", "lat"])
    r = ops_features.spherical_perimeter(df).collect()[0]
    expect = sum(
        _hav_km(quad[i][1], quad[i][0],
                quad[(i + 1) % 4][1], quad[(i + 1) % 4][0])
        for i in range(4)
    )
    assert r.n_verts == 4
    assert r.perim_km == pytest.approx(expect, abs=1e-5)
