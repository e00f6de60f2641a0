"""Gate registry extension 17 — spatial neighborhood & shape batch:
H3 gridDisk analog (k-ring explode), per-entity trajectory rollup
(integer-mm haversine path sums), and the exact convex-hull vertex
set (int64 cross products on the 2^-20-degree grid). Every formula
shared through sqlgen so the DuckDB oracle runs identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _t, gate
from pdal_spark.operators import features as ops_features
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import temporal as ops_temporal

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# grid_disk — H3 gridDisk(cell, k): the halo/radius-query explode
# (H3Filter.cpp's cell index, one ring out). Ring tagged; longitude
# wraps, rows past the poles drop — on BOTH sides by construction.
# ---------------------------------------------------------------------------

_GD_RES = 6
_GD_K = 1

_GD_CELLS = f"""
    cells AS MATERIALIZED (
      SELECT DISTINCT {G.qcell('lat', 'lon', _GD_RES)} AS h3_cell
      FROM {_PTS}
    )
"""

_GD_SQL = f"""
    WITH {_GD_CELLS},
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx), (VALUES (-1), (0), (1)) dy(dy)
    )
    SELECT h3_cell,
           {G.qcell_neighbor('h3_cell', 'dx', 'dy', _GD_RES, DK)}
             AS disk_cell,
           greatest(abs(dx), abs(dy)) AS ring
    FROM cells, offs
    WHERE {G.qcell_neighbor_valid('h3_cell', 'dy', _GD_RES, DK)}
"""


@gate("grid_disk", _GD_SQL)
def q_grid_disk(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    cells = ops_h3.h3_encode(pts, "lat", "lon", res=_GD_RES).select(
        "h3_cell"
    ).distinct()
    return ops_h3.grid_disk(cells, "h3_cell", res=_GD_RES, k=_GD_K)


# ---------------------------------------------------------------------------
# trajectory_stats — per-user movement rollup over time-ordered
# geocoded events: integer-mm haversine legs (quantize-then-sum, so
# the path total is partitioning-invariant), net displacement,
# straightness ratio in 2^20 fixed point.
# ---------------------------------------------------------------------------

_TJ_Q = 1 << 20
_HAV_LEG = G.haversine_m("plat", "plon", "lat", "lon")
_HAV_NET = G.haversine_m("flat", "flon", "llat", "llon")

_TJ_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT e.event_id, e.user_id, e.ts, {G.geo_lat('e.event_id')} AS lat,
             {G.geo_lon('e.event_id')} AS lon
      FROM events e
    ),
    legs AS (
      SELECT user_id, lat, lon,
             lag(lat) OVER w AS plat, lag(lon) OVER w AS plon,
             row_number() OVER w AS rn,
             row_number() OVER wd AS rnd
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
             wd AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
    ),
    agg AS (
      SELECT user_id,
             count(*) AS n_points,
             coalesce(sum(CAST(floor({_HAV_LEG} * {G.fnum(1000.0)}
                 + {G.fnum(0.5)}) AS BIGINT)), 0) AS path_mm,
             max(CASE WHEN rn = 1 THEN lat END) AS flat,
             max(CASE WHEN rn = 1 THEN lon END) AS flon,
             max(CASE WHEN rnd = 1 THEN lat END) AS llat,
             max(CASE WHEN rnd = 1 THEN lon END) AS llon
      FROM legs GROUP BY user_id
    )
    SELECT user_id, n_points, path_mm,
           CAST(floor({_HAV_NET} * {G.fnum(1000.0)} + {G.fnum(0.5)})
             AS BIGINT) AS net_mm,
           CASE WHEN path_mm > 0 THEN
             (CAST(floor({_HAV_NET} * {G.fnum(1000.0)} + {G.fnum(0.5)})
                AS BIGINT) * {_TJ_Q}) // path_mm
           END AS straightness_q
    FROM agg
"""


@gate("trajectory_stats", _TJ_SQL)
def q_trajectory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_temporal.trajectory_stats(
        pts, key_col="user_id", ts="ts", id_col="event_id"
    )


# ---------------------------------------------------------------------------
# convex_hull — exact hull VERTEX set of a filtered point subset
# (hexbin-boundary family). Strict-left edge test over int64-
# quantized coordinates: every cross product exact, so hash equality
# pins the whole vertex set. The distributed monotone-chain scale
# path (operators.features.convex_hull) is pytest-pinned equal.
# ---------------------------------------------------------------------------

_CH_MOD = 53
_CH_Q = 1 << 20

_CH_SQL = f"""
    WITH sub AS MATERIALIZED (
      SELECT DISTINCT
        CAST(floor(lon * {_CH_Q}) AS BIGINT) AS qx,
        CAST(floor(lat * {_CH_Q}) AS BIGINT) AS qy
      FROM (SELECT {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon
            FROM events WHERE event_id % {_CH_MOD} = 0) g
    ),
    chk AS (
      SELECT p.qx AS px, p.qy AS py, q.qx AS ex, q.qy AS ey,
             min(CASE WHEN (q.qx - p.qx) * (r.qy - p.qy)
                 - (q.qy - p.qy) * (r.qx - p.qx) > 0
                 OR ((q.qx - p.qx) * (r.qy - p.qy)
                     - (q.qy - p.qy) * (r.qx - p.qx) = 0
                     AND (q.qx - p.qx) * (r.qx - p.qx)
                         + (q.qy - p.qy) * (r.qy - p.qy) > 0)
                 THEN 1 ELSE 0 END) AS mc
      FROM sub p
      JOIN sub q ON NOT (q.qx = p.qx AND q.qy = p.qy)
      JOIN sub r ON NOT (r.qx = p.qx AND r.qy = p.qy)
               AND NOT (r.qx = q.qx AND r.qy = q.qy)
      GROUP BY 1, 2, 3, 4
    )
    SELECT DISTINCT px AS qx, py AS qy FROM chk WHERE mc = 1
"""


@gate("convex_hull", _CH_SQL)
def q_convex_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _CH_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id")
    return ops_features.convex_hull_exact(pts, x="lon", y="lat",
                                          quant=_CH_Q)

