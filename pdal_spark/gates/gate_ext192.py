"""Gate registry extension 192 — LISA/structure batch: local
Geary's c and the primacy index."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_cells
from pdal_spark.operators import stats as ops_stats

DK = G.DUCKDB

_LG_SQL = f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c,
             CAST(count(*) AS BIGINT) AS xv
      FROM (SELECT event_id, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) pts
      GROUP BY 1
    ),
    mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(xv) AS BIGINT) AS s FROM cellv),
    d AS MATERIALIZED (
      SELECT c, CAST(n * xv - s AS BIGINT) AS d, n
      FROM cellv, mom
    ),
    sd2 AS (SELECT CAST(sum(d * d) AS BIGINT) AS sum_d2 FROM d),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx),
           (VALUES (-1), (0), (1)) dy(dy)
      WHERE NOT (dx.dx = 0 AND dy.dy = 0)
    ),
    per AS (
      SELECT a.c, a.n, CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum((a.d - b.d) * (a.d - b.d)) AS BIGINT)
               AS num_i
      FROM d a, offs
      JOIN d b
        ON b.c = {G.qcell_neighbor('a.c', 'offs.dx', 'offs.dy',
                                   _FD_RES, DK)}
      WHERE {G.qcell_neighbor_valid('a.c', 'offs.dy', _FD_RES, DK)}
      GROUP BY a.c, a.n
    )
    SELECT c, n_i, num_i,
           CASE WHEN sum_d2 > 0 THEN
             cast(n as double) * cast(num_i as double)
             / cast(sum_d2 as double) END AS c_local
    FROM per, sd2
"""


@gate("local_geary", _LG_SQL)
def q_local_geary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_stats.local_geary(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell",
        value="x",
    )


_PR_SQL = """
    WITH per AS MATERIALIZED (
      SELECT user_id % 40 AS e,
             CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT)
               AS v
      FROM events GROUP BY 1
    ),
    ranked AS (
      SELECT e, v,
             CAST(row_number() OVER (ORDER BY v DESC, e ASC)
               AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM per
    ),
    agg AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(max(CASE WHEN rn = 1 THEN v END) AS BIGINT)
               AS v1,
             CAST(sum(v) AS BIGINT) AS top4_sum
      FROM ranked WHERE rn <= 4
    )
    SELECT n, v1, top4_sum,
           CASE WHEN top4_sum > 0 THEN cast(v1 as double)
             / cast(top4_sum as double) END AS primacy
    FROM agg
"""


@gate("primacy_index", _PR_SQL)
def q_primacy_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 40).alias("e"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.primacy_index(ev, entity="e", value="v")
