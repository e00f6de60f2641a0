"""Gate registry extension 230 — perf-model batch: Apdex and USL
fit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_AP_T = 100
_AP_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 6 AS k,
             CAST(floor(value * 2) AS BIGINT) AS l
      FROM events
    )
    SELECT k, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l <= {_AP_T} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_sat,
           CAST(sum(CASE WHEN l > {_AP_T} AND l <= {4 * _AP_T}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_tol,
           CASE WHEN count(*) > 0 THEN
             cast(2 * sum(CASE WHEN l <= {_AP_T} THEN 1
               ELSE 0 END)
             + sum(CASE WHEN l > {_AP_T} AND l <= {4 * _AP_T}
               THEN 1 ELSE 0 END) as double)
             / (2.0e0 * cast(count(*) as double)) END AS apdex
    FROM s GROUP BY k
"""


@gate("apdex", _AP_SQL)
def q_apdex(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 6).alias("k"),
        F.expr("cast(floor(value * 2) as bigint)").alias("l"),
    )
    return ops_stats.apdex(ev, key="k", latency="l", t_ms=_AP_T)


_US_Q = float(ops_stats.USL_Q)
_US_N = "(1 + event_id % 32)"
# planted contention curve: X = 50N // (10 + (N - 1)) scaled x10
_US_X = f"(500 * {_US_N} // (10 + ({_US_N} - 1)))"
_US_X_SP = f"(500 * {_US_N} div (10 + ({_US_N} - 1)))"


def _us_d(v: str) -> str:
    return f"cast({v} as double)"


_US_DET = (
    f"({_us_d('m')} * ({_us_d('s2')} * {_us_d('s4')}"
    f" - {_us_d('s3')} * {_us_d('s3')})"
    f" - {_us_d('s1')} * ({_us_d('s1')} * {_us_d('s4')}"
    f" - {_us_d('s3')} * {_us_d('s2')})"
    f" + {_us_d('s2')} * ({_us_d('s1')} * {_us_d('s3')}"
    f" - {_us_d('s2')} * {_us_d('s2')}))"
)


def _us_cramer(col: int) -> str:
    rows = [["m", "s1", "s2"], ["s1", "s2", "s3"],
            ["s2", "s3", "s4"]]
    mat = [row[:] for row in rows]
    for i, rv in enumerate(("t0", "t1", "t2")):
        mat[i][col] = rv
    a, b, c = mat[0]
    p, qq, r = mat[1]
    u, v, w = mat[2]
    return (
        f"({_us_d(a)} * ({_us_d(qq)} * {_us_d(w)}"
        f" - {_us_d(r)} * {_us_d(v)})"
        f" - {_us_d(b)} * ({_us_d(p)} * {_us_d(w)}"
        f" - {_us_d(r)} * {_us_d(u)})"
        f" + {_us_d(c)} * ({_us_d(p)} * {_us_d(v)}"
        f" - {_us_d(qq)} * {_us_d(u)}))"
    )


_US_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT CAST({_US_N} AS BIGINT) AS nn,
             CAST({_US_X} AS BIGINT) AS x
      FROM events WHERE event_id % 7 = 0
    ),
    pts AS (
      SELECT nn,
             CAST(floor(cast(nn as double) / cast(x as double)
               * {_US_Q!r}e0 + 0.5e0) AS BIGINT) AS y_q
      FROM s WHERE nn >= 1 AND x >= 1
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(nn) AS BIGINT) AS s1,
             CAST(sum(nn * nn) AS BIGINT) AS s2,
             CAST(sum(nn * nn * nn) AS BIGINT) AS s3,
             CAST(sum(nn * nn * nn * nn) AS BIGINT) AS s4,
             CAST(sum(y_q) AS BIGINT) AS t0,
             CAST(sum(nn * y_q) AS BIGINT) AS t1,
             CAST(sum(nn * nn * y_q) AS BIGINT) AS t2
      FROM pts
    )
    SELECT m AS n_pts,
           CASE WHEN {_US_DET} <> 0.0e0 THEN
             ({_us_cramer(0)} / {_US_DET}) / {_US_Q!r}e0 END
             AS c0,
           CASE WHEN {_US_DET} <> 0.0e0 THEN
             ({_us_cramer(1)} / {_US_DET}) / {_US_Q!r}e0 END
             AS c1,
           CASE WHEN {_US_DET} <> 0.0e0 THEN
             ({_us_cramer(2)} / {_US_DET}) / {_US_Q!r}e0 END
             AS c2
    FROM mom
"""


@gate("usl_fit", _US_SQL)
def q_usl_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where("event_id % 7 = 0") \
        .select(
            F.expr(f"cast({_US_N} as bigint)").alias("nn"),
            F.expr(f"cast({_US_X_SP} as bigint)").alias("x"),
        )
    return ops_stats.usl_fit(ev, concurrency="nn",
                             throughput="x")
