"""Gate registry extension 163 — hydrology composition: topographic
wetness index (flow accumulation oracle joined with the slope
oracle, verbatim)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import gate
from pdal_spark.gates.gate_ext37 import _fg_sql
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_best_cte, _fd_cells
from pdal_spark.operators import raster as ops_raster

_WI_Z = 0.1
_WI_MT = G.fnum(0.001)
_WI_K = G.fnum(_WI_Z / 2.0)
_WI_P = f"({_WI_K} * cast(gx2 as double))"
_WI_Q = f"({_WI_K} * cast(gy2 as double))"
_FG_RENAMED = (
    _fg_sql()
    .replace("cellv", "gcellv")
    .replace("offs", "goffs")
    .replace("nbrs", "gnbrs")
)
_WI_SLOPE = (
    "CASE WHEN gx2 IS NULL OR gy2 IS NULL THEN NULL"
    f" ELSE round(sqrt({_WI_P} * {_WI_P} + {_WI_Q} * {_WI_Q}), 9)"
    " END"
)
_WI_SQL = f"""
    WITH RECURSIVE {_fd_best_cte()},
    walk AS (
      SELECT c AS src, nc AS cur FROM best
      UNION ALL
      SELECT w.src, b.nc FROM walk w JOIN best b ON b.c = w.cur
    ),
    acc AS (
      SELECT v.c AS cell, CAST(coalesce(a.cnt, 0) AS BIGINT) AS acc
      FROM cellv v LEFT JOIN (
        SELECT cur, count(*) AS cnt FROM walk GROUP BY cur
      ) a ON a.cur = v.c
    ),
    slp AS (
      SELECT cell, {_WI_SLOPE} AS slope_tan
      FROM ({_FG_RENAMED}) g
    )
    SELECT acc.cell, acc.acc, slp.slope_tan,
           CASE WHEN slp.slope_tan IS NOT NULL THEN
             round(ln((cast(acc.acc as double) + 1.0e0)
             / greatest(slp.slope_tan, {_WI_MT})), 6) + 0.0e0 END
             AS twi_r
    FROM acc JOIN slp ON acc.cell = slp.cell
"""


@gate("wetness_index", _WI_SQL)
def q_wetness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.wetness_index(
        _fd_cells(spark, sf_dir), res=_FD_RES, z_scale=_WI_Z,
        cell="cell", value="x",
    )
