"""Gate registry extension 83 — terrain-analysis batch over the D8
lattice: watershed basin labeling (pointer-doubling fixpoint vs a
recursive path-walk oracle), TPI/TRI/roughness terrain indices
(focal economics), and the 8-transect line-of-sight viewshed
(running-max window, shifted floor-div slopes so Spark `div` and
DuckDB `//` agree — verify-notes sign trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_best_cte, _fd_cells
from pdal_spark.operators import raster as ops_raster

DK = G.DUCKDB

_WS_SQL = f"""
    WITH RECURSIVE {_fd_best_cte()},
    pits AS MATERIALIZED (
      SELECT v.c FROM cellv v LEFT JOIN best b ON b.c = v.c
      WHERE b.c IS NULL
    ),
    walk AS (
      SELECT c AS c0, c AS cur FROM cellv
      UNION ALL
      SELECT w.c0, b.nc FROM walk w JOIN best b ON b.c = w.cur
    )
    SELECT w.c0 AS cell, w.cur AS basin
    FROM walk w JOIN pits p ON p.c = w.cur
"""


@gate("watershed_label", _WS_SQL)
def q_watershed_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.watershed_label(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell", value="x"
    )


from pdal_spark.gate import _PTS  # noqa: E402

_TI_SQL = f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c, count(*) AS zv
      FROM {_PTS} GROUP BY 1
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx), (VALUES (-1), (0), (1)) dy(dy)
      WHERE NOT (dx.dx = 0 AND dy.dy = 0)
    ),
    agg AS (
      SELECT a.c, a.zv, count(*) AS n_nbrs, sum(b.zv) AS zn_sum,
             sum((a.zv - b.zv) * (a.zv - b.zv)) AS tri_ssq,
             max(b.zv) AS zn_max, min(b.zv) AS zn_min
      FROM cellv a, offs
      JOIN cellv b
        ON b.c = {G.qcell_neighbor('a.c', 'offs.dx', 'offs.dy',
                                   _FD_RES, DK)}
      WHERE {G.qcell_neighbor_valid('a.c', 'offs.dy', _FD_RES, DK)}
      GROUP BY a.c, a.zv
    )
    SELECT c AS cell, CAST(n_nbrs AS BIGINT) AS n_nbrs,
           CAST(zv * {ops_raster.FOCAL_Q}
                - (zn_sum * {ops_raster.FOCAL_Q}) // n_nbrs
                AS BIGINT) AS tpi_q,
           CAST(tri_ssq AS BIGINT) AS tri_ssq,
           CAST(greatest(zn_max, zv) - least(zn_min, zv) AS BIGINT)
             AS rough
    FROM agg
"""


@gate("terrain_indices", _TI_SQL)
def q_terrain_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.terrain_indices(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell", value="x"
    )


# Viewshed origin: the lattice middle cell (8, 8) at res 4 — always
# observed at sf >= 0.001 (geocode spreads uniformly over the grid).
_VS_ORIGIN_IX, _VS_ORIGIN_IY = 8, 8
_VS_ORIGIN = int(eval(G.qcell_pack(str(_VS_ORIGIN_IX),
                                   str(_VS_ORIGIN_IY), _FD_RES)))


def _vs_sql() -> str:
    n = 1 << _FD_RES
    ix_c, iy_c = G.qcell_deconstruct("c", DK)
    d8c = ops_raster.d8_code_sql("sign(dx)", "sign(dy)")
    sh, q = ops_raster.VIEW_SHIFT, ops_raster.FOCAL_Q
    return f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c, count(*) AS zv
      FROM {_PTS} GROUP BY 1
    ),
    rays AS MATERIALIZED (
      SELECT c, zv,
             ((({ix_c}) - {_VS_ORIGIN_IX} + {n // 2}) % {n} + {n})
               % {n} - {n // 2} AS dx,
             ({iy_c}) - {_VS_ORIGIN_IY} AS dy
      FROM cellv
    ),
    onray AS (
      SELECT r.c, CAST({d8c} AS INT) AS ray,
             greatest(abs(dx), abs(dy)) AS d,
             ((r.zv - o.zv + {sh} * greatest(abs(dx), abs(dy)))
              * {q}) // greatest(abs(dx), abs(dy)) AS slope_q
      FROM rays r,
           (SELECT zv FROM cellv WHERE c = {_VS_ORIGIN}) o
      WHERE NOT (dx = 0 AND dy = 0)
        AND (dx = 0 OR dy = 0 OR abs(dx) = abs(dy))
    )
    SELECT c AS cell, ray, CAST(d AS BIGINT) AS d,
           CAST(slope_q AS BIGINT) AS slope_q,
           slope_q >= coalesce(
             max(slope_q) OVER (
               PARTITION BY ray ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), {-(1 << 62)}) AS visible
    FROM onray
"""


@gate("viewshed_transect", _vs_sql())
def q_viewshed_transect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.viewshed_transect(
        _fd_cells(spark, sf_dir), res=_FD_RES, origin=_VS_ORIGIN,
        cell="cell", value="x",
    )

