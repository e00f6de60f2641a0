"""Gate registry extension 37 — cartographic-generalization & focal-
raster batch: Visvalingam-Whyatt polyline simplification (parallel
local-minimum rounds, unrolled-round oracle), 3x3 focal mean, and the
central-difference focal gradient over the cell lattice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import transform as ops_transform

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# simplify_polyline — per-user tracks, 2 rounds.
# ---------------------------------------------------------------------------

_VW_EPS = 1 << 50  # generous: at 2^-20 coords this removes most mid
_VW_ROUNDS = 2
_VW_Q = ops_transform.VW_COORD_Q
_VW_BIG = ops_transform.VW_BIG


def _vw_sql(rounds: int) -> str:
    parts = [f"""
    WITH r0 AS MATERIALIZED (
      SELECT user_id AS k, ts, event_id AS id,
             CAST(floor({G.geo_lon('event_id')} * {_VW_Q}) AS BIGINT)
               AS xq,
             CAST(floor({G.geo_lat('event_id')} * {_VW_Q}) AS BIGINT)
               AS yq
      FROM events
    )"""]
    prev = "r0"
    for i in range(1, rounds + 1):
        parts.append(f""",
    s{i} AS (
      SELECT *, row_number() OVER w AS pos,
             lag(xq) OVER w AS px, lag(yq) OVER w AS py,
             lead(xq) OVER w AS nx, lead(yq) OVER w AS ny
      FROM {prev}
      WINDOW w AS (PARTITION BY k ORDER BY ts ASC, id ASC)
    ),
    a{i} AS (
      SELECT *, CASE WHEN px IS NULL OR nx IS NULL
        THEN CAST({_VW_BIG} AS BIGINT) ELSE
        abs((nx - px) * (yq - py) - (ny - py) * (xq - px)) END AS a2
      FROM s{i}
    ),
    j{i} AS (
      SELECT *, lag(a2) OVER w AS la, lag(pos) OVER w AS lp,
             lead(a2) OVER w AS na, lead(pos) OVER w AS np
      FROM a{i}
      WINDOW w AS (PARTITION BY k ORDER BY ts ASC, id ASC)
    ),
    r{i} AS MATERIALIZED (
      SELECT k, ts, id, xq, yq FROM j{i}
      WHERE NOT (a2 < {_VW_EPS}
        AND (la IS NULL OR a2 < la OR (a2 = la AND pos < lp))
        AND (na IS NULL OR a2 < na OR (a2 = na AND pos < np)))
    )""")
        prev = f"r{i}"
    parts.append(f"""
    SELECT k AS user_id, id AS event_id, xq, yq FROM {prev}
    """)
    return "".join(parts)


@gate("simplify_polyline", _vw_sql(_VW_ROUNDS))
def q_simplify_polyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_transform.simplify_polyline(
        pts, eps_area2_q=_VW_EPS, rounds=_VW_ROUNDS
    )


# ---------------------------------------------------------------------------
# focal_mean / focal_gradient — over res-4 per-cell counts.
# ---------------------------------------------------------------------------

_FO_RES = 4
_FO_N = 1 << _FO_RES

_FO_CELLS = f"""
    cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FO_RES)} AS c, count(*) AS xv
      FROM {_PTS} GROUP BY 1
    )
"""

_FO_OFFS = """
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx), (VALUES (-1), (0), (1)) dy(dy)
    )
"""

_FM_SQL = f"""
    WITH {_FO_CELLS},
    {_FO_OFFS},
    nbrs AS (
      SELECT cellv.c,
             {G.qcell_neighbor('cellv.c', 'offs.dx', 'offs.dy',
                               _FO_RES, DK)} AS nc
      FROM cellv, offs
      WHERE {G.qcell_neighbor_valid('cellv.c', 'offs.dy', _FO_RES, DK)}
    )
    SELECT nbrs.c AS cell, count(*) AS n_nbrs, sum(v.xv) AS nbr_sum,
           (sum(v.xv) * {ops_raster.FOCAL_Q}) // count(*) AS mean_q
    FROM nbrs JOIN cellv v ON v.c = nbrs.nc
    GROUP BY nbrs.c
"""


@gate("focal_mean", _FM_SQL)
def q_focal_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    cellv = (
        ops_h3.h3_encode(pts, "lat", "lon", res=_FO_RES, out="cell")
        .groupBy("cell").agg(F.count(F.lit(1)).alias("x"))
    )
    return ops_raster.focal_mean(cellv, res=_FO_RES, cell="cell",
                                 value="x")


def _fg_sql() -> str:
    ix_c, iy_c = G.qcell_deconstruct("nbrs.c", DK)
    ix_n, iy_n = G.qcell_deconstruct("nbrs.nc", DK)
    dx = (
        f"CAST((((({ix_n}) - ({ix_c}) + {_FO_N // 2}) % {_FO_N}"
        f" + {_FO_N}) % {_FO_N}) AS INT) - {_FO_N // 2}"
    )
    dy = f"CAST(({iy_n}) - ({iy_c}) AS INT)"
    return f"""
    WITH {_FO_CELLS},
    {_FO_OFFS},
    nbrs AS (
      SELECT cellv.c,
             {G.qcell_neighbor('cellv.c', 'offs.dx', 'offs.dy',
                               _FO_RES, DK)} AS nc
      FROM cellv, offs
      WHERE {G.qcell_neighbor_valid('cellv.c', 'offs.dy', _FO_RES, DK)}
    ),
    tagged AS (
      SELECT nbrs.c, nbrs.nc, {dx} AS dx, {dy} AS dy FROM nbrs
    ),
    j AS (
      SELECT t.c, t.dx, t.dy, v.xv AS xj
      FROM tagged t JOIN cellv v ON v.c = t.nc
    )
    SELECT c AS cell,
           max(CASE WHEN dx = 1 AND dy = 0 THEN xj END)
             - max(CASE WHEN dx = -1 AND dy = 0 THEN xj END) AS gx2,
           max(CASE WHEN dx = 0 AND dy = 1 THEN xj END)
             - max(CASE WHEN dx = 0 AND dy = -1 THEN xj END) AS gy2
    FROM j GROUP BY c
    """


@gate("focal_gradient", _fg_sql())
def q_focal_gradient(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    cellv = (
        ops_h3.h3_encode(pts, "lat", "lon", res=_FO_RES, out="cell")
        .groupBy("cell").agg(F.count(F.lit(1)).alias("x"))
    )
    return ops_raster.focal_gradient(cellv, res=_FO_RES, cell="cell",
                                     value="x")

