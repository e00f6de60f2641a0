"""Gate registry extension 156 — robust/spatial-metric batch:
Davies-Bouldin index, Siegel repeated-median slope, General G."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_cells
from pdal_spark.operators import cluster as ops_cluster
from pdal_spark.operators import stats as ops_stats

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# davies_bouldin — same hashed 2-D clusters as calinski_harabasz
# ---------------------------------------------------------------------------
_DB_Q = float(ops_cluster.DB_Q)
_DB_PX = f"(CAST(floor({G.geo_lon('event_id')}) AS BIGINT))"
_DB_PY = f"(CAST(floor({G.geo_lat('event_id')}) AS BIGINT))"
_DB_DD = (
    "sqrt((cast(a.sx as double) * cast(b.n_c as double)"
    " - cast(b.sx as double) * cast(a.n_c as double))"
    " * (cast(a.sx as double) * cast(b.n_c as double)"
    " - cast(b.sx as double) * cast(a.n_c as double))"
    " + (cast(a.sy as double) * cast(b.n_c as double)"
    " - cast(b.sy as double) * cast(a.n_c as double))"
    " * (cast(a.sy as double) * cast(b.n_c as double)"
    " - cast(b.sy as double) * cast(a.n_c as double)))"
    " / (cast(a.n_c as double) * cast(b.n_c as double))"
)
_DB_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT ({_DB_PX} // 60) AS g, {_DB_PX} AS px, {_DB_PY} AS py
      FROM events
    ),
    grp AS MATERIALIZED (
      SELECT g, CAST(count(*) AS BIGINT) AS n_c,
             CAST(sum(px) AS BIGINT) AS sx,
             CAST(sum(py) AS BIGINT) AS sy,
             CAST(sum(px * px + py * py) AS BIGINT) AS ss,
             sqrt(cast(count(*) as double)
               * cast(sum(px * px + py * py) as double)
               - cast(sum(px) as double) * cast(sum(px) as double)
               - cast(sum(py) as double) * cast(sum(py) as double))
               / cast(count(*) as double) AS s_c
      FROM s GROUP BY g
    ),
    ratio AS (
      SELECT a.g AS gi, (a.s_c + b.s_c) / ({_DB_DD}) AS r
      FROM grp a JOIN grp b ON a.g <> b.g
    ),
    mx AS (
      SELECT gi, max(r) AS mr FROM ratio GROUP BY gi
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(cast(floor(mr * {_DB_Q!r}e0 + 0.5e0)
               as bigint)) AS BIGINT) AS db_q_sum
      FROM mx
    )
    SELECT k, db_q_sum,
           CASE WHEN k > 0 THEN cast(db_q_sum as double)
             / (cast(k as double) * {_DB_Q!r}e0) END AS db
    FROM agg
"""


@gate("davies_bouldin", _DB_SQL)
def q_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = f"cast(floor({G.geo_lon('event_id')}) as bigint)"
    py = f"cast(floor({G.geo_lat('event_id')}) as bigint)"
    ev = _t(spark, sf_dir, "events").select(
        F.expr(f"({px}) div 60").alias("g"),
        F.expr(px).alias("px"), F.expr(py).alias("py"),
    )
    return ops_cluster.davies_bouldin(ev, label="g", x="px", y="py")


# ---------------------------------------------------------------------------
# siegel_slope — repeated median over a planted-linear slice
# ---------------------------------------------------------------------------
_SG_Q = ops_stats.SIEGEL_Q
_SG_PRED = "event_id % 23 = 0"
_SG_X = "(event_id % 97)"
_SG_Y = (
    f"(3 * (event_id % 97)"
    f" + CAST({G.lehmer2('event_id')} % 7 AS BIGINT))"
)
_SG_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS i, CAST({_SG_X} AS BIGINT) AS xi,
             CAST({_SG_Y} AS BIGINT) AS yi
      FROM events WHERE {_SG_PRED}
    ),
    pairs AS MATERIALIZED (
      SELECT a.i, b.i AS j,
             CAST(((a.yi - b.yi) * CAST({_SG_Q} AS BIGINT))
               // (a.xi - b.xi) AS BIGINT) AS s_q
      FROM s a JOIN s b ON a.i <> b.i AND a.xi <> b.xi
    ),
    med_i AS (
      SELECT i, s_q AS mi_q FROM (
        SELECT i, s_q,
               row_number() OVER (PARTITION BY i
                 ORDER BY s_q ASC, j ASC) AS rn,
               count(*) OVER (PARTITION BY i) AS m
        FROM pairs
      ) t WHERE rn = (m + 1) // 2
    )
    SELECT CAST(n AS BIGINT) AS n, mi_q AS slope_q,
           cast(mi_q as double) / {float(_SG_Q)!r}e0 AS slope
    FROM (
      SELECT i, mi_q,
             row_number() OVER (ORDER BY mi_q ASC, i ASC) AS rn,
             count(*) OVER () AS n
      FROM med_i
    ) t WHERE rn = (n + 1) // 2
"""


@gate("siegel_slope", _SG_SQL)
def q_siegel_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_SG_PRED).select(
        F.col("event_id").alias("i"),
        F.expr(f"cast({_SG_X} as bigint)").alias("xi"),
        F.expr(f"cast({_SG_Y} as bigint)").alias("yi"),
    )
    return ops_stats.siegel_slope(ev, x="xi", y="yi", id_col="i")


# ---------------------------------------------------------------------------
# general_g — global hot-spot ratio over the res-4 density cells
# ---------------------------------------------------------------------------
_GG_SQL = f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c,
             CAST(count(*) AS BIGINT) AS xv
      FROM (SELECT event_id, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) pts
      GROUP BY 1
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xv) AS BIGINT) AS s,
             CAST(sum(xv * xv) AS BIGINT) AS ss
      FROM cellv
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx),
           (VALUES (-1), (0), (1)) dy(dy)
      WHERE NOT (dx.dx = 0 AND dy.dy = 0)
    ),
    num AS (
      SELECT CAST(count(*) AS BIGINT) AS w_pairs,
             CAST(sum(a.xv * b.xv) AS BIGINT) AS num
      FROM cellv a, offs
      JOIN cellv b
        ON b.c = {G.qcell_neighbor('a.c', 'offs.dx', 'offs.dy',
                                   _FD_RES, DK)}
      WHERE {G.qcell_neighbor_valid('a.c', 'offs.dy', _FD_RES, DK)}
    )
    SELECT n, w_pairs, num,
           CAST(s * s - ss AS BIGINT) AS den,
           CASE WHEN s * s - ss > 0 THEN cast(num as double)
             / cast(s * s - ss as double) END AS g
    FROM num, mom
"""


@gate("general_g", _GG_SQL)
def q_general_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_stats.general_g(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell",
        value="x",
    )
