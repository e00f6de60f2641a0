"""Gate registry extension 125 — composition showcase: terrain
profile along great-circle routes (slerp waypoints x bilinear
lattice sampling — two already-oracled operators chained; the
oracle chains their CTEs identically)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import transform as ops_transform

_RP_MOD = 41
_RP_N = 6
_RP_SUB = 1000
_RP_F = f"(cast(i as double) / cast({_RP_N} as double))"
_RP_LAT, _RP_LON = ops_transform.slerp_sql(
    "lat1", "lon1", "lat2", "lon2", _RP_F
)
_RP_Z = f"({G.mix_hash('gx * 100 + gy')} % 1000)"

_RP_SQL = f"""
    WITH cells AS MATERIALIZED (
      SELECT gx, gy, {_RP_Z} AS z
      FROM (SELECT DISTINCT event_id % 50 AS gx,
                   (event_id // 50) % 40 AS gy
            FROM events) g
    ),
    ext AS (SELECT max(gx) + 1 AS w, max(gy) + 1 AS h FROM cells),
    routes AS MATERIALIZED (
      SELECT event_id,
             {G.geo_lat('event_id')} AS lat1,
             {G.geo_lon('event_id')} AS lon1,
             {G.geo_lat('event_id * 7 + 1')} AS lat2,
             {G.geo_lon('event_id * 7 + 1')} AS lon2
      FROM events WHERE event_id % {_RP_MOD} = 0
    ),
    wp AS MATERIALIZED (
      SELECT event_id, i, {_RP_LAT} AS wlat, {_RP_LON} AS wlon
      FROM (SELECT event_id, lat1, lon1, lat2, lon2,
                   unnest(range(0, {_RP_N + 1})) AS i
            FROM routes) s
    ),
    pts AS MATERIALIZED (
      SELECT event_id, i, wlat, wlon,
             cast(floor((wlon + 180.0e0) * (w * {_RP_SUB})
               / 360.0e0) as bigint) AS px,
             cast(floor((wlat + 90.0e0) * (h * {_RP_SUB})
               / 180.0e0) as bigint) AS py
      FROM wp, ext
    ),
    four AS (
      SELECT event_id, i, wlat, wlon, px, py,
             px // {_RP_SUB} + o.ox AS cx,
             py // {_RP_SUB} + o.oy AS cy,
             (CASE WHEN o.ox = 0 THEN {_RP_SUB} - px % {_RP_SUB}
                   ELSE px % {_RP_SUB} END)
             * (CASE WHEN o.oy = 0 THEN {_RP_SUB} - py % {_RP_SUB}
                     ELSE py % {_RP_SUB} END) AS w
      FROM pts, (VALUES (0, 0), (1, 0), (0, 1), (1, 1)) o(ox, oy)
    )
    SELECT event_id, i, wlat, wlon, px, py,
           CAST(sum(w * z) AS BIGINT) AS v_q,
           cast(sum(w * z) as double)
             / cast({_RP_SUB * _RP_SUB} as double) AS v
    FROM four JOIN cells ON cells.gx = four.cx AND cells.gy = four.cy
    GROUP BY event_id, i, wlat, wlon, px, py
    HAVING count(*) = 4
"""


@gate("route_profile", _RP_SQL)
def q_route_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    routes = ev.where(F.col("event_id") % _RP_MOD == 0).select(
        "event_id",
        F.expr(G.geo_lat("event_id")).alias("lat1"),
        F.expr(G.geo_lon("event_id")).alias("lon1"),
        F.expr(G.geo_lat("event_id * 7 + 1")).alias("lat2"),
        F.expr(G.geo_lon("event_id * 7 + 1")).alias("lon2"),
    )
    cells = (
        ev.select(
            (F.col("event_id") % 50).alias("gx"),
            ((F.col("event_id") / 50).cast("long") % 40).alias("gy"),
        )
        .distinct()
        .select("gx", "gy", F.expr(_RP_Z).alias("z"))
    )
    out = ops_raster.route_profile(
        routes, cells, n=_RP_N, sub=_RP_SUB
    )
    return out.select(
        "event_id", F.col("i").cast("long").alias("i"),
        "wlat", "wlon", "px", "py", "v_q", "v",
    )
