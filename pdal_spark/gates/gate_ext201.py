"""Gate registry extension 201 — fractal/gradient batch: box-
counting dimension and radial density profile."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_cells
from pdal_spark.operators import stats as ops_stats

DK = G.DUCKDB

_BC_Q = float(ops_stats.BCD_Q)
_BC_LEVELS = [2, 3, _FD_RES]
_BC_LN2Q = G.fnum(math.log(2.0) * _BC_Q)


def _bc_level_sql(r: int) -> str:
    if r == _FD_RES:
        return f"""
      SELECT CAST({r} AS BIGINT) AS lvl,
             CAST(count(DISTINCT c) AS BIGINT) AS nb
      FROM cellv
    """
    return f"""
      SELECT CAST({r} AS BIGINT) AS lvl,
             CAST(count(DISTINCT
               {G.qcell_parent('c', _FD_RES, r, DK)})
               AS BIGINT) AS nb
      FROM cellv
    """


_BC_SQL = f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c
      FROM (SELECT event_id, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) pts
      GROUP BY 1
    ),
    ladder AS (
      {" UNION ALL ".join(_bc_level_sql(r) for r in _BC_LEVELS)}
    ),
    pts AS (
      SELECT lvl,
             CAST(floor(ln(cast(nb as double))
               * {_BC_Q!r}e0 + 0.5e0) AS BIGINT) AS y_q
      FROM ladder
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n_levels,
             CAST(sum(lvl) AS BIGINT) AS sx,
             CAST(sum(y_q) AS BIGINT) AS sy,
             CAST(sum(lvl * y_q) AS BIGINT) AS sxy,
             CAST(sum(lvl * lvl) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT n_levels,
           CAST(n_levels * sxy - sx * sy AS BIGINT) AS num,
           CAST(n_levels * sxx - sx * sx AS BIGINT) AS den,
           CASE WHEN n_levels * sxx - sx * sx <> 0 THEN
             cast(n_levels * sxy - sx * sy as double)
             / cast(n_levels * sxx - sx * sx as double)
             / {_BC_LN2Q} END AS dimension
    FROM mom
"""


@gate("box_counting", _BC_SQL)
def q_box_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _fd_cells(spark, sf_dir).select("cell")
    return ops_stats.box_counting_dimension(
        cells, res=_FD_RES, coarser=[2, 3], cell="cell"
    )


_RP_BQ = 40
_RP_NB = 6
_RP_PX = f"(CAST({G.lehmer2('event_id')} % 500 AS BIGINT))"
_RP_PY = f"(CAST({G.lehmer2('event_id * 7 + 2')} % 500 AS BIGINT))"
_RP_PRED = "event_id % 7 = 0"
_RP_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_RP_PX} AS px, {_RP_PY} AS py
      FROM events WHERE {_RP_PRED}
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(px) AS BIGINT) AS sx,
             CAST(sum(py) AS BIGINT) AS sy
      FROM s
    ),
    d AS (
      SELECT (n * px - sx) * (n * px - sx)
             + (n * py - sy) * (n * py - sy) AS d2n, n
      FROM s, mom
    ),
    banded AS (
      SELECT CAST(b.band AS BIGINT) AS band
      FROM d, (SELECT unnest(range({_RP_NB})) AS band) b
      WHERE d2n >= b.band * b.band
              * CAST({_RP_BQ * _RP_BQ} AS BIGINT) * n * n
        AND d2n < (b.band + 1) * (b.band + 1)
              * CAST({_RP_BQ * _RP_BQ} AS BIGINT) * n * n
    )
    SELECT band, CAST(count(*) AS BIGINT) AS n_points
    FROM banded GROUP BY band
"""


@gate("radial_profile", _RP_SQL)
def q_radial_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_RP_PRED).select(
        F.expr(
            f"cast({G.lehmer2('event_id')} % 500 as bigint)"
        ).alias("px"),
        F.expr(
            f"cast({G.lehmer2('event_id * 7 + 2')} % 500"
            " as bigint)"
        ).alias("py"),
    )
    return ops_stats.radial_profile(
        ev, x="px", y="py", band_q=_RP_BQ, n_bands=_RP_NB
    )
