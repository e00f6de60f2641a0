"""Gate registry extension 147 — cartography/earthworks batch:
polar stereographic projection, Web-Mercator Tissot factors,
two-epoch cut/fill volumes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import transform as ops_transform

_ST_LAT = f"({G.geo_lat('event_id')})"
_ST_LON = f"({G.geo_lon('event_id')})"

# ---------------------------------------------------------------------------
# reproject_stereographic — shared dialect-neutral fragment
# ---------------------------------------------------------------------------
_ST_X, _ST_Y = ops_transform.stereographic_sql(_ST_LAT, _ST_LON)
_ST_SQL = f"""
    SELECT event_id, {_ST_X} AS x_ste, {_ST_Y} AS y_ste
    FROM events
"""


@gate("reproject_stereographic", _ST_SQL)
def q_reproject_stereographic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    return ops_transform.reproject_stereographic(
        pts, lat="lat", lon="lon"
    ).select("event_id", "x_ste", "y_ste")


# ---------------------------------------------------------------------------
# tissot_factors — Web-Mercator distortion at the geocoded points
# ---------------------------------------------------------------------------
_TS_ZOOM = 10
_TS_SQL_PARTS = None


def _tissot_sql() -> str:
    import math

    rad = G.fnum(math.pi / 180.0)
    c0 = G.fnum(2.0 * math.pi * 6378137.0 / 256.0)
    k = f"({G.fnum(1.0)} / cos({_ST_LAT} * {rad}))"
    res = (
        f"({c0} * cos({_ST_LAT} * {rad})"
        f" / {G.fnum(float(1 << _TS_ZOOM))})"
    )
    return f"""
    SELECT event_id, round({k}, 6) AS k_r,
           round({k} * {k}, 6) AS area_r,
           round({res}, 3) AS res_r
    FROM events
    """


@gate("tissot_factors", _tissot_sql())
def q_tissot_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    return ops_transform.tissot_mercator(
        pts, lat="lat", zoom=_TS_ZOOM
    ).select("event_id", "k_r", "area_r", "res_r")


# ---------------------------------------------------------------------------
# cut_fill — density DEMs of two event epochs (even/odd ids)
# ---------------------------------------------------------------------------
_CF_RES = 5
_CF_AREA = 0.25


def _cf_cells(spark, sf_dir, pred) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(pred)
    pts = ops_h3.geocode(ev, "event_id")
    return (
        ops_h3.h3_encode(pts, "lat", "lon", res=_CF_RES, out="cell")
        .groupBy("cell").agg(F.count(F.lit(1)).alias("x"))
    )


_CF_CELL = G.qcell(f"({G.geo_lat('event_id')})",
                   f"({G.geo_lon('event_id')})", _CF_RES)
_CF_SQL = f"""
    WITH za AS MATERIALIZED (
      SELECT {_CF_CELL} AS c, CAST(count(*) AS BIGINT) AS za
      FROM events WHERE event_id % 2 = 0 GROUP BY 1
    ),
    zb AS MATERIALIZED (
      SELECT {_CF_CELL} AS c, CAST(count(*) AS BIGINT) AS zb
      FROM events WHERE event_id % 2 = 1 GROUP BY 1
    ),
    j AS (
      SELECT coalesce(za.za, 0) AS za, coalesce(zb.zb, 0) AS zb
      FROM za FULL OUTER JOIN zb ON za.c = zb.c
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(greatest(za - zb, 0)) AS BIGINT) AS cut_q,
             CAST(sum(greatest(zb - za, 0)) AS BIGINT) AS fill_q
      FROM j
    )
    SELECT n_cells, cut_q, fill_q,
           CAST(fill_q - cut_q AS BIGINT) AS net_q,
           cast(cut_q as double) * {_CF_AREA!r}e0 AS cut_vol,
           cast(fill_q as double) * {_CF_AREA!r}e0 AS fill_vol
    FROM agg
"""


@gate("cut_fill", _CF_SQL)
def q_cut_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.cut_fill(
        _cf_cells(spark, sf_dir, "event_id % 2 = 0"),
        _cf_cells(spark, sf_dir, "event_id % 2 = 1"),
        cell="cell", value="x", cell_area=_CF_AREA,
    )
