"""Gate registry extension 195 — zonal-terrain batch: per-block
hypsometry and threshold area share."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_cells
from pdal_spark.operators import raster as ops_raster

DK = G.DUCKDB

_BT_PRES = 2
_BT_CELLS = f"""
    cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c,
             CAST(count(*) AS BIGINT) AS zv
      FROM (SELECT event_id, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) pts
      GROUP BY 1
    )
"""

_BT_SQL = f"""
    WITH {_BT_CELLS},
    agg AS (
      SELECT {G.qcell_parent('c', _FD_RES, _BT_PRES, DK)}
               AS parent,
             CAST(count(*) AS BIGINT) AS n_cells,
             CAST(min(zv) AS BIGINT) AS z_min,
             CAST(max(zv) AS BIGINT) AS z_max,
             CAST(sum(zv) AS BIGINT) AS z_sum
      FROM cellv GROUP BY 1
    )
    SELECT parent, n_cells, z_min, z_max,
           CAST(z_max - z_min AS BIGINT) AS relief,
           CASE WHEN z_max > z_min THEN
             (cast(z_sum as double) / cast(n_cells as double)
             - cast(z_min as double))
             / cast(z_max - z_min as double) END AS hypso
    FROM agg
"""


@gate("block_terrain", _BT_SQL)
def q_block_terrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.block_terrain_summary(
        _fd_cells(spark, sf_dir), res=_FD_RES,
        parent_res=_BT_PRES, cell="cell", value="x",
    )


_TA_THRS = [2, 5, 10]
_TA_SQL = f"""
    WITH {_BT_CELLS},
    ladder AS (
      SELECT {G.qcell_parent('c', _FD_RES, _BT_PRES, DK)}
               AS parent,
             zv, CAST(t.thr AS BIGINT) AS thr
      FROM cellv,
           (SELECT unnest([{", ".join(map(str, _TA_THRS))}])
              AS thr) t
    )
    SELECT parent, thr, CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(CASE WHEN zv >= thr THEN 1 ELSE 0 END)
             AS BIGINT) AS n_above,
           cast(sum(CASE WHEN zv >= thr THEN 1 ELSE 0 END)
             as double) / cast(count(*) as double) AS share
    FROM ladder GROUP BY parent, thr
"""


@gate("threshold_area", _TA_SQL)
def q_threshold_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.threshold_area_share(
        _fd_cells(spark, sf_dir), res=_FD_RES,
        parent_res=_BT_PRES, thresholds=_TA_THRS,
        cell="cell", value="x",
    )
