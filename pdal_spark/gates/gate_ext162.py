"""Gate registry extension 162 — multiscale-spatial batch: Moran
correlogram (ring ladder) and gliding-box lacunarity."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_cells
from pdal_spark.operators import stats as ops_stats

DK = G.DUCKDB

_MC_MAXR = 3
_MC_CELLS = f"""
    cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c,
             CAST(count(*) AS BIGINT) AS xv
      FROM (SELECT event_id, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) pts
      GROUP BY 1
    )
"""


def _mc_offs(k: int) -> str:
    vals = ", ".join(f"({v})" for v in range(-k, k + 1))
    return f"""
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy,
             greatest(abs(dx.dx), abs(dy.dy)) AS ring
      FROM (VALUES {vals}) dx(dx), (VALUES {vals}) dy(dy)
      WHERE NOT (dx.dx = 0 AND dy.dy = 0)
    )
"""


_MC_SQL = f"""
    WITH {_MC_CELLS},
    mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(xv) AS BIGINT) AS s FROM cellv),
    d AS MATERIALIZED (
      SELECT c, CAST(n * xv - s AS BIGINT) AS d, n
      FROM cellv, mom
    ),
    {_mc_offs(_MC_MAXR)},
    num AS (
      SELECT offs.ring,
             CAST(count(*) AS BIGINT) AS w_pairs,
             CAST(sum(a.d * b.d) AS BIGINT) AS num
      FROM d a, offs
      JOIN d b
        ON b.c = {G.qcell_neighbor('a.c', 'offs.dx', 'offs.dy',
                                   _FD_RES, DK)}
      WHERE {G.qcell_neighbor_valid('a.c', 'offs.dy', _FD_RES, DK)}
      GROUP BY offs.ring
    ),
    den AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(sum(d * d) AS BIGINT) AS den
      FROM d
    )
    SELECT CAST(ring AS BIGINT) AS ring, n, w_pairs, num, den,
           CASE WHEN w_pairs > 0 AND den <> 0 THEN
             (cast(n as double) * cast(num as double))
             / (cast(w_pairs as double) * cast(den as double))
             END AS morans_i
    FROM num, den
"""


@gate("moran_correlogram", _MC_SQL)
def q_moran_correlogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return ops_stats.moran_correlogram(
        _fd_cells(spark, sf_dir), res=_FD_RES,
        max_ring=_MC_MAXR, cell="cell", value="x",
    )


# ---------------------------------------------------------------------------
# lacunarity — parent rollups of the res-4 density raster
# ---------------------------------------------------------------------------
_LC_RS = [1, 2, 3]


def _lac_sql() -> str:
    parts = []
    for r in _LC_RS:
        pexpr = G.qcell_parent("c", _FD_RES, r, DK)
        parts.append(f"""
    SELECT CAST({r} AS BIGINT) AS r,
           CAST(count(*) AS BIGINT) AS n_boxes,
           CAST(sum(m) AS BIGINT) AS sum_m,
           CAST(sum(m * m) AS BIGINT) AS sum_m2,
           CASE WHEN sum(m) <> 0 THEN
             cast(count(*) as double) * cast(sum(m * m) as double)
             / (cast(sum(m) as double) * cast(sum(m) as double))
             END AS lac
    FROM (
      SELECT {pexpr} AS p, CAST(sum(xv) AS BIGINT) AS m
      FROM cellv GROUP BY 1
    ) boxes""")
    return (
        f"WITH {_MC_CELLS}" + "\n    UNION ALL ".join(parts)
    )


@gate("lacunarity", _lac_sql())
def q_lacunarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_stats.lacunarity(
        _fd_cells(spark, sf_dir), res=_FD_RES, coarser=_LC_RS,
        cell="cell", value="x",
    )
