"""Gate registry extension 86 — spatial-statistics + forecasting +
stream-order batch: local Moran's I (LISA) on the cell lattice,
Ripley's K pair-count ladder and the empirical semivariogram over a
point sample (brute-force oracles proving the grid-bucketed pair
generation lossless), Holt linear smoothing (floor-div fixed point,
rank-lockstep recursive oracle), and Strahler stream order over the
D8 drainage tree (unrolled monotone rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_best_cte, _fd_cells
from pdal_spark.gates.gate_ext84 import _DTW_KEYS, _DTW_N, _US_PER_H
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# local_morans_i — res-4 per-cell counts (the morans_i fixture).
# ---------------------------------------------------------------------------

_LM_SQL = f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c, count(*) AS xv
      FROM (SELECT event_id, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) pts
      GROUP BY 1
    ),
    mom AS (SELECT count(*) AS n, sum(xv) AS sx FROM cellv),
    dev AS MATERIALIZED (
      SELECT c, n, CAST(n * xv - sx AS BIGINT) AS d
      FROM cellv, mom
    ),
    sd2 AS (SELECT CAST(sum(d * d) AS BIGINT) AS sum_d2 FROM dev),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx), (VALUES (-1), (0), (1)) dy(dy)
      WHERE NOT (dx.dx = 0 AND dy.dy = 0)
    ),
    si AS (
      SELECT a.c, count(*) AS n_i, sum(b.d) AS s_i
      FROM dev a, offs
      JOIN dev b
        ON b.c = {G.qcell_neighbor('a.c', 'offs.dx', 'offs.dy',
                                   _FD_RES, DK)}
      WHERE {G.qcell_neighbor_valid('a.c', 'offs.dy', _FD_RES, DK)}
      GROUP BY a.c
    )
    SELECT dev.c AS cell, CAST(n_i AS BIGINT) AS n_i, dev.d,
           CAST(s_i AS BIGINT) AS s_i,
           CAST(dev.n * dev.d * s_i AS DOUBLE)
             / CAST(sum_d2 AS DOUBLE) AS lisa
    FROM dev JOIN si ON si.c = dev.c, sd2
"""


@gate("local_morans_i", _LM_SQL)
def q_local_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_stats.local_morans_i(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell", value="x"
    )


# ---------------------------------------------------------------------------
# ripleys_k / semivariogram — point sample (event_id % 7: ~86 pts
# at sf0.001 so the smoke scale still yields pairs, ~1.4k at
# sf0.01); brute-force oracles prove the 3x3 grid-bucket pair join
# lossless.
# ---------------------------------------------------------------------------

_RK_MOD = 7
_RK_Q = 1 << 10
_RK_RADII = [2048, 4096, 8192]

_RK_PAIRS = f"""
    pts AS MATERIALIZED (
      SELECT event_id AS pid,
             CAST(floor(({G.geo_lon('event_id')}) * {_RK_Q})
                  AS BIGINT) AS xq,
             CAST(floor(({G.geo_lat('event_id')}) * {_RK_Q})
                  AS BIGINT) AS yq,
             CAST(floor(value * {_RK_Q}) AS BIGINT) AS zq
      FROM events WHERE event_id % {_RK_MOD} = 0
    ),
    pr AS MATERIALIZED (
      SELECT a.pid AS id_a, b.pid AS id_b,
             (a.xq - b.xq) * (a.xq - b.xq)
             + (a.yq - b.yq) * (a.yq - b.yq) AS d2,
             (a.zq - b.zq) * (a.zq - b.zq) AS dz2
      FROM pts a JOIN pts b ON a.pid < b.pid
    )
"""

_RK_SQL = f"""
    WITH {_RK_PAIRS}
    SELECT CAST(r.r AS BIGINT) AS r_q, count(*) AS n_pairs
    FROM pr, (SELECT unnest([{", ".join(map(str, _RK_RADII))}]) AS r) r
    WHERE pr.d2 <= r.r * r.r
    GROUP BY 1
"""


def _rk_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _RK_MOD == 0
    )
    return ops_h3.geocode(ev, "event_id")


@gate("ripleys_k", _RK_SQL)
def q_ripleys_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ops_stats.ripleys_k(
        _rk_points(spark, sf_dir), radii_q=_RK_RADII,
        id_col="event_id", coord_q=_RK_Q,
    )
    return out.select(F.col("r_q").cast("long").alias("r_q"),
                      "n_pairs")


_SV_BINS = 8
_SV_BIN_Q = 1 << 10

_SV_SQL = f"""
    WITH {_RK_PAIRS}
    SELECT CAST(b.b AS BIGINT) AS bin, count(*) AS n_pairs,
           CAST(sum(dz2) AS BIGINT) AS sum_sq_dz
    FROM pr, (SELECT unnest(range({_SV_BINS})) AS b) b
    WHERE pr.d2 >= b.b * b.b * {_SV_BIN_Q * _SV_BIN_Q}
      AND pr.d2 < (b.b + 1) * (b.b + 1) * {_SV_BIN_Q * _SV_BIN_Q}
    GROUP BY 1
"""


@gate("semivariogram", _SV_SQL)
def q_semivariogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ops_stats.semivariogram(
        _rk_points(spark, sf_dir), value="value", id_col="event_id",
        bin_q=_SV_BIN_Q, n_bins=_SV_BINS, coord_q=_RK_Q,
        value_q=_RK_Q,
    )
    return out.select(F.col("bin").cast("long").alias("bin"),
                      "n_pairs", "sum_sq_dz")


# ---------------------------------------------------------------------------
# holt_linear — 24-hour dense count series per user bucket (the
# dtw_pairs fixture); oracle marches rank lockstep carrying (l, b).
# ---------------------------------------------------------------------------

_HL_A = 307
_HL_B = 102


def _hl_sql() -> str:
    q, sc = ops_temporal.HOLT_Q, ops_temporal.HOLT_SCALE
    a, bq = _HL_A, _HL_B
    return f"""
    WITH RECURSIVE counts AS MATERIALIZED (
      SELECT user_id % {_DTW_KEYS} AS k,
             (epoch_us(ts) // {_US_PER_H}) % {_DTW_N} AS h,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    keys AS MATERIALIZED (SELECT DISTINCT k FROM counts),
    hours AS (SELECT unnest(range({_DTW_N})) AS h),
    ser AS MATERIALIZED (
      SELECT keys.k, hours.h, hours.h + 1 AS r,
             CAST(coalesce(c.c, 0) * {sc} AS BIGINT) AS xs
      FROM keys CROSS JOIN hours
      LEFT JOIN counts c ON c.k = keys.k AND c.h = hours.h
    ),
    st AS (
      SELECT s1.k, s1.h, CAST(1 AS BIGINT) AS r,
             s1.xs AS l, s2.xs - s1.xs AS b,
             CAST(NULL AS BIGINT) AS fc
      FROM ser s1 JOIN ser s2 ON s2.k = s1.k AND s2.r = 2
      WHERE s1.r = 1
      UNION ALL
      SELECT s.k, s.h, s.r,
             ({a} * s.xs + ({q} - {a}) * (st.l + st.b)) // {q} AS l,
             ({bq} * ((({a} * s.xs + ({q} - {a}) * (st.l + st.b))
                       // {q}) - st.l)
              + ({q} - {bq}) * st.b) // {q} AS b,
             st.l + st.b AS fc
      FROM st JOIN ser s ON s.k = st.k AND s.r = st.r + 1
    )
    SELECT k, h, l AS level_q, b AS trend_q, fc AS forecast_q
    FROM st
    """


@gate("holt_linear", _hl_sql())
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % _DTW_KEYS).alias("k"),
        ((F.unix_micros(F.col("ts").cast("timestamp"))
          / F.lit(_US_PER_H)).cast("long") % _DTW_N).alias("h"),
    )
    counts = ev.groupBy("k", "h").agg(F.count(F.lit(1)).alias("c"))
    keys = counts.select("k").distinct()
    hours = ev.sparkSession.range(_DTW_N).select(
        F.col("id").alias("h"))
    dense = (
        keys.crossJoin(hours)
        .join(counts, on=["k", "h"], how="left")
        .select("k", "h", F.coalesce("c", F.lit(0)).alias("c"))
    )
    return ops_temporal.holt_linear(
        dense, key="k", order="h", value="c",
        alpha_q=_HL_A, beta_q=_HL_B,
    )


# ---------------------------------------------------------------------------
# strahler_order — over the D8 drainage tree; unrolled rounds.
# ---------------------------------------------------------------------------

_SO_ROUNDS = 12


def _so_sql(rounds: int) -> str:
    parts = [f"""
    WITH {_fd_best_cte()},
    o0 AS MATERIALIZED (
      SELECT c, CAST(1 AS BIGINT) AS ord FROM cellv
    )"""]
    for t in range(1, rounds + 1):
        parts.append(f""",
    ch{t} AS MATERIALIZED (
      SELECT b.nc AS c, o.ord
      FROM best b JOIN o{t - 1} o ON o.c = b.c
    ),
    mx{t} AS MATERIALIZED (
      SELECT c, max(ord) AS mx FROM ch{t} GROUP BY c
    ),
    cm{t} AS MATERIALIZED (
      SELECT ch.c, count(*) AS cm
      FROM ch{t} ch JOIN mx{t} m ON m.c = ch.c AND ch.ord = m.mx
      GROUP BY ch.c
    ),
    o{t} AS MATERIALIZED (
      SELECT v.c,
             CAST(CASE WHEN m.mx IS NULL THEN 1
                       WHEN cm.cm >= 2 THEN m.mx + 1
                       ELSE m.mx END AS BIGINT) AS ord
      FROM cellv v LEFT JOIN mx{t} m ON m.c = v.c
      LEFT JOIN cm{t} cm ON cm.c = v.c
    )""")
    parts.append(f"""
    SELECT c AS cell, ord AS "order" FROM o{rounds}
    """)
    return "".join(parts)


@gate("strahler_order", _so_sql(_SO_ROUNDS))
def q_strahler_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.strahler_order(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell",
        value="x", rounds=_SO_ROUNDS,
    )

