"""Gate registry extension 232 — conic + ECEF closed-form
reprojection family (VERDICT r2 #5): ellipsoidal Lambert conformal
conic, ellipsoidal Albers, geodetic -> ECEF and the Bowring inverse.
Published Snyder PP-1395 numeric examples pinned reference-
independently in tests/test_published_vectors.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import transform as ops_transform

_LAT = f"({G.geo_lat('event_id')})"
_LON = f"({G.geo_lon('event_id')})"


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_h3.geocode(ev, "event_id").select(
        "event_id", "lat", "lon"
    )


def _lcc_gate_sql() -> str:
    xe, ye = ops_transform.lcc_sql(
        "lat", "lon", 33.0, 45.0, 23.0, -96.0
    )
    return f"""
    WITH p AS MATERIALIZED (
      SELECT event_id, {_LAT} AS lat, {_LON} AS lon FROM events
    )
    SELECT event_id, {xe} AS x_lcc, {ye} AS y_lcc FROM p
    """


@gate("reproject_lcc", _lcc_gate_sql())
def q_reproject_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts(spark, sf_dir)
    return ops_transform.reproject_lcc(pts).select(
        "event_id", "x_lcc", "y_lcc"
    )


def _aea_gate_sql() -> str:
    xe, ye = ops_transform.albers_ellipsoidal_sql(
        "lat", "lon", 29.5, 45.5, 23.0, -96.0
    )
    return f"""
    WITH p AS MATERIALIZED (
      SELECT event_id, {_LAT} AS lat, {_LON} AS lon FROM events
    )
    SELECT event_id, {xe} AS x_aea_e, {ye} AS y_aea_e FROM p
    """


@gate("albers_ellipsoidal", _aea_gate_sql())
def q_albers_ellipsoidal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = _pts(spark, sf_dir)
    return ops_transform.reproject_albers_ellipsoidal(pts).select(
        "event_id", "x_aea_e", "y_aea_e"
    )


def _ecef_gate_sql() -> str:
    xe, ye, ze = ops_transform.ecef_sql("lat", "lon")
    return f"""
    WITH p AS MATERIALIZED (
      SELECT event_id, {_LAT} AS lat, {_LON} AS lon FROM events
    )
    SELECT event_id, {xe} AS ecef_x, {ye} AS ecef_y, {ze} AS ecef_z
    FROM p
    """


@gate("geodetic_ecef", _ecef_gate_sql())
def q_geodetic_ecef(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts(spark, sf_dir)
    return ops_transform.geodetic_to_ecef(pts).select(
        "event_id", "ecef_x", "ecef_y", "ecef_z"
    )


def _ecef_inv_gate_sql() -> str:
    """Bowring inverse over the mm-rounded forward outputs — the
    rounding makes the inverse's INPUTS identical doubles in both
    engines, so the trig chain + round(9) matches the house
    convention."""
    import math

    xe, ye, ze = ops_transform.ecef_sql("lat", "lon")
    a, e2 = ops_transform.WGS84_A, ops_transform.WGS84_E2
    b = a * math.sqrt(1.0 - e2)
    ep2 = e2 / (1.0 - e2)
    deg = G.fnum(180.0 / math.pi)
    p = "sqrt(ecef_x * ecef_x + ecef_y * ecef_y)"
    u = f"atan2(ecef_z * {G.fnum(a)}, {p} * {G.fnum(b)})"
    su, cu = f"sin({u})", f"cos({u})"
    phi = (
        f"atan2(ecef_z + {G.fnum(ep2 * b)} * {su} * {su} * {su},"
        f" {p} - {G.fnum(e2 * a)} * {cu} * {cu} * {cu})"
    )
    s = f"sin({phi})"
    nn = (
        f"({G.fnum(a)} / sqrt({G.fnum(1.0)}"
        f" - {G.fnum(e2)} * {s} * {s}))"
    )
    return f"""
    WITH p AS MATERIALIZED (
      SELECT event_id, {_LAT} AS lat, {_LON} AS lon FROM events
    ), f AS MATERIALIZED (
      SELECT event_id, {xe} AS ecef_x, {ye} AS ecef_y,
             {ze} AS ecef_z
      FROM p
    )
    SELECT event_id,
           round({phi} * {deg}, 9) + 0.0e0 AS lat,
           round(atan2(ecef_y, ecef_x) * {deg}, 9) + 0.0e0 AS lon,
           round({p} / cos({phi}) - {nn}, 3) + 0.0e0 AS h
    FROM f
    """


@gate("ecef_inverse", _ecef_inv_gate_sql())
def q_ecef_inverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts(spark, sf_dir)
    fwd = ops_transform.geodetic_to_ecef(pts).select(
        "event_id", "ecef_x", "ecef_y", "ecef_z"
    )
    return ops_transform.ecef_to_geodetic(fwd).select(
        "event_id", "lat", "lon", "h"
    )
