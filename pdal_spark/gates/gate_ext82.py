"""Gate registry extension 82 — Kleinberg two-state burst detection
over per-user event streams (Kleinberg, "Bursty and Hierarchical
Structure in Streams", KDD 2002).

Oracle: the map_match convention specialised to k = 2 — per-key
base/burst mean gaps and integer emission costs computed in plain
SQL, then a forward recursive CTE marching every key's gap sequence
in rank lockstep carrying the 2-element dp vector, and a backward
recursive CTE replaying the stay-vs-jump decision (backpointers are
a pure function of the forward dp rows). The ln(g)·2^20 emission
constant follows the established floor(ln·Q + 0.5) gate precedent
(gate_ext10/13/18); everything else is int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import gate
from pdal_spark.operators.temporal import BURST_Q, burst_detect

_BD_KEYS = 20          # user_id % 20 stream key
_BD_MOD = 7            # 1-in-7 events form the streams
_BD_PEN = 2 * BURST_Q  # switch penalty (gamma * ln n analog)
_BD_SN, _BD_SD = 3, 1  # burst rate = 3x base rate


def _bd_sql() -> str:
    q = int(BURST_Q)

    def em(g: str) -> str:
        return (
            f"(x * {q}) // {g} + CAST(floor(ln(CAST({g} AS DOUBLE))"
            f" * {q} + 0.5e0) AS BIGINT)"
        )

    argmin = "CASE WHEN f.d0 <= f.d1 THEN 0 ELSE 1 END"
    jmin = f"least(f.d0, f.d1) + {_BD_PEN}"
    return f"""
    WITH RECURSIVE pts AS MATERIALIZED (
      SELECT user_id % {_BD_KEYS} AS key, epoch_us(ts) AS t
      FROM events WHERE event_id % {_BD_MOD} = 0
    ),
    gaps AS MATERIALIZED (
      SELECT key, t, x, row_number() OVER (
               PARTITION BY key ORDER BY t
             ) AS r
      FROM (
        SELECT key, t,
               t - lag(t) OVER (PARTITION BY key ORDER BY t) AS x
        FROM pts
      ) WHERE x IS NOT NULL
    ),
    st AS MATERIALIZED (
      SELECT key, greatest(1, CAST(sum(x) AS BIGINT) // count(*)) AS g0
      FROM gaps GROUP BY key
    ),
    base AS MATERIALIZED (
      SELECT gp.key, gp.t, gp.x, gp.r,
             {em('st.g0')} AS e0,
             {em(f'greatest(1, (st.g0 * {_BD_SD}) // {_BD_SN})')} AS e1
      FROM gaps gp JOIN st ON gp.key = st.key
    ),
    fwd AS (
      SELECT key, t, x, r, e0 AS d0, e1 AS d1
      FROM base WHERE r = 1
      UNION ALL
      SELECT b.key, b.t, b.x, b.r,
             b.e0 + least(f.d0, {jmin}) AS d0,
             b.e1 + least(f.d1, {jmin}) AS d1
      FROM base b JOIN fwd f ON b.key = f.key AND b.r = f.r + 1
    ),
    lastr AS (SELECT key, max(r) AS rmax FROM base GROUP BY key),
    bt AS (
      SELECT f.key, f.t, f.x, f.r, {argmin} AS j
      FROM fwd f JOIN lastr l ON l.key = f.key AND f.r = l.rmax
      UNION ALL
      SELECT f.key, f.t, f.x, f.r,
             CASE WHEN (CASE bt.j WHEN 0 THEN f.d0 ELSE f.d1 END)
                       <= {jmin}
                  THEN bt.j ELSE {argmin} END AS j
      FROM fwd f JOIN bt ON f.key = bt.key AND f.r = bt.r - 1
    )
    SELECT key, t AS ts_us, x AS gap_us,
           CAST(j AS INT) AS state, j = 1 AS is_burst
    FROM bt
    """


@gate("burst_detect", _bd_sql())
def q_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.gate import _t

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_id") % _BD_MOD == 0)
        .select(
            (F.col("user_id") % _BD_KEYS).alias("key"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        )
    )
    return burst_detect(
        ev, key="key", ts_us="tus",
        s_num=_BD_SN, s_den=_BD_SD, penalty_q=_BD_PEN,
    )


# ---------------------------------------------------------------------------
# D8 hydrology: flow_direction + flow_accumulation over the res-4
# cell lattice (elevation = per-cell point count, the focal fixture).
# ---------------------------------------------------------------------------

from pdal_spark import sqlgen as G  # noqa: E402
from pdal_spark.gate import _PTS, _points  # noqa: E402
from pdal_spark.operators import h3 as ops_h3  # noqa: E402
from pdal_spark.operators import raster as ops_raster  # noqa: E402

DK = G.DUCKDB

_FD_RES = 4


def _fd_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return (
        ops_h3.h3_encode(pts, "lat", "lon", res=_FD_RES, out="cell")
        .groupBy("cell").agg(F.count(F.lit(1)).alias("x"))
    )


def _fd_best_cte() -> str:
    """Shared WITH-body: cellv + scored D8 candidates + best edge."""
    d8c = ops_raster.d8_code_sql("offs.dx", "offs.dy")
    w_card = ops_raster.D8_RT2_Q
    w_diag = ops_raster.FOCAL_Q
    return f"""
    cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c, count(*) AS zv
      FROM {_PTS} GROUP BY 1
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx), (VALUES (-1), (0), (1)) dy(dy)
      WHERE NOT (dx.dx = 0 AND dy.dy = 0)
    ),
    cand AS MATERIALIZED (
      SELECT a.c, b.c AS nc, a.zv - b.zv AS zd,
             {d8c} AS d8c,
             (a.zv - b.zv) * (CASE WHEN offs.dx = 0 OR offs.dy = 0
                              THEN {w_card} ELSE {w_diag} END) AS score
      FROM cellv a, offs
      JOIN cellv b
        ON b.c = {G.qcell_neighbor('a.c', 'offs.dx', 'offs.dy',
                                   _FD_RES, DK)}
      WHERE {G.qcell_neighbor_valid('a.c', 'offs.dy', _FD_RES, DK)}
        AND a.zv > b.zv
    ),
    best AS MATERIALIZED (
      SELECT c, nc, d8c, zd FROM (
        SELECT c, nc, d8c, zd, row_number() OVER (
                 PARTITION BY c ORDER BY score DESC, d8c ASC
               ) AS rn
        FROM cand
      ) WHERE rn = 1
    )
    """


_FD_SQL = f"""
    WITH {_fd_best_cte()}
    SELECT v.c AS cell, CAST(coalesce(b.d8c, 0) AS INT) AS d8,
           coalesce(b.nc, v.c) AS down_cell,
           CAST(coalesce(b.zd, 0) AS BIGINT) AS zdrop
    FROM cellv v LEFT JOIN best b ON b.c = v.c
"""


@gate("flow_direction", _FD_SQL)
def q_flow_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.flow_direction(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell", value="x"
    )


# Accumulation: the D8 graph is functional + strictly downhill, so
# acc(v) = |{u : v on u's downhill path}| — a recursive path walk.
_FA_SQL = f"""
    WITH RECURSIVE {_fd_best_cte()},
    walk AS (
      SELECT c AS src, nc AS cur FROM best
      UNION ALL
      SELECT w.src, b.nc FROM walk w JOIN best b ON b.c = w.cur
    )
    SELECT v.c AS cell, CAST(coalesce(a.cnt, 0) AS BIGINT) AS acc
    FROM cellv v LEFT JOIN (
      SELECT cur, count(*) AS cnt FROM walk GROUP BY cur
    ) a ON a.cur = v.c
"""


@gate("flow_accumulation", _FA_SQL)
def q_flow_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.flow_accumulation(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell", value="x"
    )

