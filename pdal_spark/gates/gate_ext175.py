"""Gate registry extension 175 — spherical-navigation batch:
geographic midpoint and UTM grid convergence."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import transform as ops_transform
from pdal_spark.sqlgen import utm_lon0

_GM_RAD = G.fnum(math.pi / 180.0)
_GM_DEG = G.fnum(180.0 / math.pi)
_GM_QF = G.fnum(float(ops_transform.GEOMID_Q))
_GM_LAT = f"({G.geo_lat('event_id')})"
_GM_LON = f"({G.geo_lon('event_id')})"


def _gm_q(e: str) -> str:
    return f"CAST(floor(round({e}, 9) * {_GM_QF} + 0.5e0) AS BIGINT)"


_GM_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT
        {_gm_q(f'cos({_GM_LAT} * {_GM_RAD})'
               f' * cos({_GM_LON} * {_GM_RAD})')} AS xq,
        {_gm_q(f'cos({_GM_LAT} * {_GM_RAD})'
               f' * sin({_GM_LON} * {_GM_RAD})')} AS yq,
        {_gm_q(f'sin({_GM_LAT} * {_GM_RAD})')} AS zq
      FROM events
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xq) AS BIGINT) AS sx,
             CAST(sum(yq) AS BIGINT) AS sy,
             CAST(sum(zq) AS BIGINT) AS sz
      FROM s
    )
    SELECT n, sx, sy, sz,
           CASE WHEN n > 0 THEN
             round(atan2(cast(sz as double),
               sqrt(cast(sx as double) * cast(sx as double)
               + cast(sy as double) * cast(sy as double)))
               * {_GM_DEG}, 6) + 0.0e0 END AS mid_lat_r,
           CASE WHEN n > 0 THEN
             round(atan2(cast(sy as double),
               cast(sx as double)) * {_GM_DEG}, 6) + 0.0e0 END
             AS mid_lon_r
    FROM agg
"""


@gate("geographic_midpoint", _GM_SQL)
def q_geographic_midpoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    return ops_transform.geographic_midpoint(pts, lat="lat",
                                             lon="lon")


_GC_ZONE = 33
_GC_L0 = G.fnum(float(utm_lon0(_GC_ZONE)))
_GC_G = (
    f"atan(tan(({_GM_LON} - {_GC_L0}) * {_GM_RAD})"
    f" * sin({_GM_LAT} * {_GM_RAD}))"
)
_GC_SQL = f"""
    SELECT event_id,
           (round({_GC_G} * {_GM_DEG}, 6) + 0.0e0) AS gamma_r
    FROM events WHERE event_id % 5 = 0
"""


@gate("grid_convergence", _GC_SQL)
def q_grid_convergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = ops_h3.geocode(
        _t(spark, sf_dir, "events").where("event_id % 5 = 0"),
        "event_id",
    )
    return ops_transform.grid_convergence(
        pts, zone=_GC_ZONE, lat="lat", lon="lon"
    ).select("event_id", "gamma_r")
