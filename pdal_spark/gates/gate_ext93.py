"""Gate registry extension 93 — lattice-distance + drainage-rollup
batch: Chebyshev distance transform (ring-min oracle), flow-path
length to the pit (pointer doubling with additive carry vs a
recursive step-count walk), and per-basin hypsometric statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_best_cte, _fd_cells
from pdal_spark.operators import raster as ops_raster

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# distance_transform — occupied = res-4 cells with count >=
# (max_count + 1) div 2 (scale-aware: nonempty at EVERY sf — the
# ripleys_k smoke lesson), horizon k = 4.
# ---------------------------------------------------------------------------

_DT_K = 4


def _dt_sql() -> str:
    offs = ", ".join(f"({d})" for d in range(-_DT_K, _DT_K + 1))
    return f"""
    WITH cnts AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c, count(*) AS n
      FROM (SELECT event_id, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) pts
      GROUP BY 1
    ),
    occ AS MATERIALIZED (
      SELECT c FROM cnts
      WHERE n >= (SELECT (max(n) + 1) // 2 FROM cnts)
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES {offs}) dx(dx), (VALUES {offs}) dy(dy)
    )
    SELECT {G.qcell_neighbor('occ.c', 'offs.dx', 'offs.dy',
                             _FD_RES, DK)} AS cell,
           CAST(min(greatest(abs(offs.dx), abs(offs.dy)))
                AS BIGINT) AS dt
    FROM occ, offs
    WHERE {G.qcell_neighbor_valid('occ.c', 'offs.dy', _FD_RES, DK)}
    GROUP BY 1
"""


def _dt_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    cnts = _fd_cells(spark, sf_dir)
    thr = cnts.agg(
        F.expr("(max(x) + 1) div 2").alias("t")
    ).collect()[0]["t"]
    return cnts.where(F.col("x") >= int(thr)).select("cell")


@gate("distance_transform", _dt_sql())
def q_distance_transform(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    return ops_raster.distance_transform(
        _dt_cells(spark, sf_dir), res=_FD_RES, cell="cell",
        max_rounds=_DT_K,
    )


# ---------------------------------------------------------------------------
# flow_path_length — recursive step-count walk to the pit.
# ---------------------------------------------------------------------------

_FPL_SQL = f"""
    WITH RECURSIVE {_fd_best_cte()},
    pits AS MATERIALIZED (
      SELECT v.c FROM cellv v LEFT JOIN best b ON b.c = v.c
      WHERE b.c IS NULL
    ),
    walk AS (
      SELECT c AS c0, c AS cur, CAST(0 AS BIGINT) AS steps
      FROM cellv
      UNION ALL
      SELECT w.c0, b.nc, w.steps + 1
      FROM walk w JOIN best b ON b.c = w.cur
    )
    SELECT w.c0 AS cell, w.steps AS path_len, w.cur AS outlet
    FROM walk w JOIN pits p ON p.c = w.cur
"""


@gate("flow_path_length", _FPL_SQL)
def q_flow_path_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.flow_path_length(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell", value="x"
    )


# ---------------------------------------------------------------------------
# basin_stats — hypsometric rollup per watershed basin.
# ---------------------------------------------------------------------------

_BS_SQL = f"""
    WITH RECURSIVE {_fd_best_cte()},
    pits AS MATERIALIZED (
      SELECT v.c FROM cellv v LEFT JOIN best b ON b.c = v.c
      WHERE b.c IS NULL
    ),
    walk AS (
      SELECT c AS c0, c AS cur FROM cellv
      UNION ALL
      SELECT w.c0, b.nc FROM walk w JOIN best b ON b.c = w.cur
    ),
    lab AS MATERIALIZED (
      SELECT w.c0 AS c, w.cur AS basin
      FROM walk w JOIN pits p ON p.c = w.cur
    )
    SELECT lab.basin, count(*) AS n_cells,
           CAST(min(v.zv) AS BIGINT) AS z_min,
           CAST(max(v.zv) AS BIGINT) AS z_max,
           CAST(sum(v.zv) AS BIGINT) AS z_sum,
           CAST(max(v.zv) - min(v.zv) AS BIGINT) AS relief
    FROM lab JOIN cellv v ON v.c = lab.c
    GROUP BY lab.basin
"""


@gate("basin_stats", _BS_SQL)
def q_basin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.basin_stats(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell", value="x"
    )

