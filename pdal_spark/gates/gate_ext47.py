"""Gate registry extension 47 — filters.georeference
(GeoreferenceFilter.cpp:154-241): trajectory-interpolated
roll/pitch/yaw rotation + local-ENU -> ECEF, mm-quantized.

Fixture: the 25-row nation table becomes the IMU trajectory (time =
n_nationkey * 10 s, slowly-drifting lon/lat radians + attitude);
events become scanner-frame points with gps_time folded into the
trajectory's span. Oracle mirrors the operator's staged selects as
nested subqueries over the SAME sqlgen formula text (all of it
dialect-free trig), so both engines evaluate identical expression
trees; outputs quantized to integer mm (the utm_xy_mm convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate

# trajectory columns from n_nationkey (dialect-free SQL over `nation`)
_TR = {
    "time": "(CAST(n_nationkey AS DOUBLE) * 10.0e0)",
    "x": "(0.042e0 + CAST(n_nationkey AS DOUBLE) * 0.0001e0)",
    "y": "(0.85e0 + CAST(n_nationkey AS DOUBLE) * 0.00005e0)",
    "z": "(100.0e0 + CAST((n_nationkey * 7) % 13 AS DOUBLE))",
    "roll": "(CAST((n_nationkey * 3) % 7 AS DOUBLE) * 0.01e0 - 0.03e0)",
    "pitch": "(CAST((n_nationkey * 5) % 9 AS DOUBLE) * 0.01e0 - 0.04e0)",
    "azimuth": "(CAST(n_nationkey AS DOUBLE) * 0.1e0 + 1.5e0)",
    "wander_angle": "(CAST(n_nationkey % 3 AS DOUBLE) * 0.001e0)",
}

# scanner-frame point columns from event_id
_PT = {
    "gps_time": "(CAST(event_id % 2399 AS DOUBLE) / 10.0e0 + 0.05e0)",
    "x": "(CAST((event_id * 13) % 41 AS DOUBLE) - 20.0e0)",
    "y": "(CAST((event_id * 29) % 37 AS DOUBLE) - 18.0e0)",
    "z": "(CAST((event_id * 17) % 11 AS DOUBLE) - 5.0e0)",
}


def _georef_sql() -> str:
    frac = "((__pt - __t1) / (__t2 - __t1))"
    traj = ", ".join(f"{e} AS {c}" for c, e in _TR.items())
    pts = ", ".join(f"{e} AS {c}" for c, e in _PT.items())
    leads = ", ".join(
        f"LEAD({c}1) OVER (ORDER BY __t1) AS {c}2"
        for c in ("__t", "__lon", "__lat", "__z",
                  "__r", "__p", "__a", "__w"))
    R = G.rot_rpy("__roll", "__pitch", "__yaw")
    nx = f"({R[0]} * x + {R[1]} * y + {R[2]} * z)"
    ny = f"({R[3]} * x + {R[4]} * y + {R[5]} * z)"
    nz = f"({R[6]} * x + {R[7]} * y + {R[8]} * z)"
    X, Y, Z = G.ecef_from_enu("__ny", "__nx", "(-__nz)",
                              "__tlat", "__tlon", "__th")
    return f"""
    SELECT event_id,
           {G.mm_q(X)} AS ecef_x_mm,
           {G.mm_q(Y)} AS ecef_y_mm,
           {G.mm_q(Z)} AS ecef_z_mm
    FROM (
      SELECT event_id, x, y, z,
             {nx} AS __nx, {ny} AS __ny, {nz} AS __nz,
             __tlat, __tlon, __th
      FROM (
        SELECT p.event_id, p.x, p.y, p.z,
               {G.interp_angle('__r1', '__r2', frac)} AS __roll,
               {G.interp_angle('__p1', '__p2', frac)} AS __pitch,
               ({G.interp_angle('__a1', '__a2', frac)}
                - {G.interp_angle('__w1', '__w2', frac)}) AS __yaw,
               {G.interp_angle('__lon1', '__lon2', frac)} AS __tlon,
               {G.interp_angle('__lat1', '__lat2', frac)} AS __tlat,
               {G.interp_linear('__z1', '__z2', frac)} AS __th
        FROM (SELECT event_id, gps_time AS __pt, x, y, z
              FROM (SELECT event_id, {pts} FROM events) _raw) p
        JOIN (
          SELECT * FROM (
            SELECT __t1, __lon1, __lat1, __z1, __r1, __p1, __a1,
                   __w1, {leads}
            FROM (SELECT time AS __t1, x AS __lon1, y AS __lat1,
                         z AS __z1, roll AS __r1, pitch AS __p1,
                         azimuth AS __a1, wander_angle AS __w1
                  FROM (SELECT {traj} FROM nation) _tr) _b
          ) _l WHERE __t2 IS NOT NULL
        ) tr ON tr.__t1 < p.__pt AND p.__pt <= tr.__t2
      ) _i
    ) _r
    """


@gate("georeference_ecef", _georef_sql())
def q_georeference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.transform import georeference

    traj = _t(spark, sf_dir, "nation").select(
        *[F.expr(e).alias(c) for c, e in _TR.items()])
    pts = _t(spark, sf_dir, "events").select(
        "event_id", *[F.expr(e).alias(c) for c, e in _PT.items()])
    out = georeference(pts, traj)
    return out.select(
        "event_id",
        F.expr(G.mm_q("x")).alias("ecef_x_mm"),
        F.expr(G.mm_q("y")).alias("ecef_y_mm"),
        F.expr(G.mm_q("z")).alias("ecef_z_mm"),
    )


# ---------------------------------------------------------------------------
# filters.projpipeline — mini PROJ-pipeline grammar over the
# closed-form step library (ProjPipelineFilter.cpp:70-120)
# ---------------------------------------------------------------------------

_PP_OP = ("+proj=pipeline"
          " +step +proj=unitconvert +xy_in=rad +xy_out=deg"
          " +step +proj=axisswap +order=2,1"
          " +step +proj=utm +zone=31"
          " +step +proj=affine +s11=0.5 +s22=2.0 +xoff=1000.0"
          " +yoff=-250.0")


def _projpipe_sql() -> str:
    # input: x = lat rad, y = lon rad (from geocode, zone-31 band)
    lat = f"(({G.geo_lat('event_id')}) * {G.fnum(G.RAD)})"
    lon = (f"((({G.geo_lon('event_id')}) / {G.fnum(60.0)}"
           f" + {G.fnum(3.0)}) * {G.fnum(G.RAD)})")
    # unitconvert rad->deg, axisswap handled by feeding utm(lat, lon)
    latd = f"(__xr * {G.fnum(G.DEG)})"
    lond = f"(__yr * {G.fnum(G.DEG)})"
    e, n = G.utm_xy(latd, lond, 31, G.DUCKDB)
    ax = f"({G.fnum(0.5)} * {e} + {G.fnum(1000.0)})"
    ay = f"({G.fnum(2.0)} * {n} + {G.fnum(-250.0)})"
    return f"""
    SELECT event_id, {G.mm_q(ax)} AS x_mm, {G.mm_q(ay)} AS y_mm
    FROM (SELECT event_id, {lat} AS __xr, {lon} AS __yr
          FROM events) _p
    """


@gate("projpipeline_chain", _projpipe_sql())
def q_projpipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3
    from pdal_spark.operators.transform import projpipeline

    ev = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    pts = ev.select(
        "event_id",
        F.expr(f"lat * {G.fnum(G.RAD)}").alias("x"),
        F.expr(f"(lon / {G.fnum(60.0)} + {G.fnum(3.0)})"
               f" * {G.fnum(G.RAD)}").alias("y"),
    )
    out = projpipeline(pts, _PP_OP)
    return out.select(
        "event_id",
        F.expr(G.mm_q("x")).alias("x_mm"),
        F.expr(G.mm_q("y")).alias("y_mm"),
    )


# ---------------------------------------------------------------------------
# filters.greedyprojection — per-tile PCA-plane Delaunay mesh with
# GP3 edge/angle connection tests (GreedyProjection.cpp:63-80).
# Rows-only: the tangent-plane eigendecomposition is float-path
# (pytest pins plane recovery + edge/angle bounds,
# tests/test_delaunay.py).
# ---------------------------------------------------------------------------


@gate("greedy_projection_mesh", None)
def q_greedy_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3
    from pdal_spark.operators.delaunay import greedy_projection

    cust = _t(spark, sf_dir, "customer").limit(400)
    pts = ops_h3.geocode(cust, "c_custkey").select(
        F.col("c_custkey").alias("pid"), "lat", "lon",
        F.expr("CAST((c_custkey * 7) % 500 AS DOUBLE) / 250.0e0")
        .alias("z"),
    )
    return greedy_projection(pts, radius=30.0, cell=20.0,
                             buffer=8.0)
