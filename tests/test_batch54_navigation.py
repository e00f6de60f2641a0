"""Batch-54 ops: rhumb line, solar position."""

import math

import pytest

from pdal_spark.operators import transform as ops_transform


def test_rhumb_along_meridian_equals_great_circle(spark):
    # due-north leg: rhumb == great circle == meridian arc
    df = spark.createDataFrame(
        [(1, 0.0, 10.0, 30.0, 10.0)],
        ["rid", "lat1", "lon1", "lat2", "lon2"],
    )
    r = ops_transform.rhumb_line(df).collect()[0]
    assert r.rhumb_km == pytest.approx(
        math.radians(30.0) * 6371.0088, abs=1e-3
    )
    assert r.rhumb_brg == pytest.approx(0.0, abs=1e-5)


def test_rhumb_along_parallel(spark):
    # equal-latitude leg at 60N: distance = dlon * cos(60) * R
    df = spark.createDataFrame(
        [(1, 60.0, 0.0, 60.0, 10.0)],
        ["rid", "lat1", "lon1", "lat2", "lon2"],
    )
    r = ops_transform.rhumb_line(df).collect()[0]
    assert r.rhumb_km == pytest.approx(
        math.radians(10.0) * math.cos(math.radians(60.0))
        * 6371.0088, abs=1e-3
    )
    assert r.rhumb_brg == pytest.approx(90.0, abs=1e-5)


def test_rhumb_never_shorter_than_haversine(spark):
    df = spark.createDataFrame(
        [(1, 10.0, -20.0, 50.0, 60.0)],
        ["rid", "lat1", "lon1", "lat2", "lon2"],
    )
    r = ops_transform.rhumb_line(df).collect()[0]

    def hav(lat1, lon1, lat2, lon2):
        p1, p2 = math.radians(lat1), math.radians(lat2)
        h = (math.sin((p2 - p1) / 2) ** 2
             + math.cos(p1) * math.cos(p2)
             * math.sin(math.radians(lon2 - lon1) / 2) ** 2)
        return 2 * 6371.0088 * math.asin(math.sqrt(h))

    assert r.rhumb_km >= hav(10, -20, 50, 60) - 1e-6


def test_solar_noon_at_subsolar_point(spark):
    # equinox-ish (doy 80 -> decl ~ 0), local noon on the meridian
    # at lat 0: sun near zenith
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 80, 12.0)],
        ["rid", "lat", "lon", "doy", "hour_utc"],
    )
    r = ops_transform.solar_position(df).collect()[0]
    assert abs(r.decl_deg) < 1.0
    assert r.hour_angle_deg == pytest.approx(0.0, abs=1e-6)
    assert r.elev_deg > 88.0


def test_solar_midnight_below_horizon(spark):
    df = spark.createDataFrame(
        [(1, 45.0, 0.0, 172, 0.0)],
        ["rid", "lat", "lon", "doy", "hour_utc"],
    )
    r = ops_transform.solar_position(df).collect()[0]
    assert r.elev_deg < 0.0
