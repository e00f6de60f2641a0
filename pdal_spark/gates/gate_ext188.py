"""Gate registry extension 188 — location-test batch: Watson-
Williams circular means and Mood's median test."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import pointpattern as ops_pp
from pdal_spark.operators import stats as ops_stats

_WW_RAD = G.fnum(math.pi / 180.0)
_WW_QF = G.fnum(float(ops_pp.CIRC_Q))
_WW_B = (
    f"(CAST({G.lehmer2('event_id')} % 90 AS BIGINT)"
    " + (user_id % 3) * 10)"
)
_WW_CQ = (
    f"CAST(floor(round(cos(({_WW_B}) * {_WW_RAD}), 9)"
    f" * {_WW_QF} + 0.5e0) AS BIGINT)"
)
_WW_SQ = (
    f"CAST(floor(round(sin(({_WW_B}) * {_WW_RAD}), 9)"
    f" * {_WW_QF} + 0.5e0) AS BIGINT)"
)
_WW_RG = (
    "sqrt(cast(sc as double) * cast(sc as double)"
    " + cast(ss as double) * cast(ss as double))"
)
_WW_RA = (
    "sqrt(cast(tc as double) * cast(tc as double)"
    " + cast(ts as double) * cast(ts as double))"
)
_WW_F = (
    "((cast(n as double) - cast(k as double))"
    f" * (cast(sum_rg_q as double) - {_WW_RA}))"
    " / ((cast(k as double) - 1.0e0)"
    f" * (cast(n as double) * {_WW_QF}"
    " - cast(sum_rg_q as double)))"
)
_WW_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 3 AS g, {_WW_CQ} AS c, {_WW_SQ} AS s
      FROM events
    ),
    per AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(s) AS BIGINT) AS ss
      FROM s GROUP BY g
    ),
    agg AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(cast(floor({_WW_RG} + 0.5e0) as bigint))
               AS BIGINT) AS sum_rg_q,
             CAST(sum(sc) AS BIGINT) AS tc,
             CAST(sum(ss) AS BIGINT) AS ts
      FROM per
    )
    SELECT n, k,
           CASE WHEN k > 1 AND cast(n as double) * {_WW_QF}
             - cast(sum_rg_q as double) > 0.0e0 THEN
             round({_WW_F}, 9) END AS f_r
    FROM agg
"""


@gate("watson_williams", _WW_SQL)
def q_watson_williams(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 3).alias("g"),
        F.expr(_WW_B).alias("b"),
    )
    return ops_pp.watson_williams(ev, group="g", bearing="b")


_MM_Q = 1 << 16
_MM_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 4 AS g, CAST(floor(value) AS BIGINT) AS v,
             event_id
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT g, v,
             CAST(row_number() OVER (ORDER BY v ASC,
               event_id ASC) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM s
    ),
    med AS (
      SELECT v AS gm FROM base WHERE rn = (n + 1) // 2
    ),
    per AS (
      SELECT g,
             CAST(sum(CASE WHEN v > gm THEN 1 ELSE 0 END)
               AS BIGINT) AS above,
             CAST(sum(CASE WHEN v <= gm THEN 1 ELSE 0 END)
               AS BIGINT) AS below
      FROM base, med GROUP BY g
    ),
    tot AS (
      SELECT CAST(sum(above) AS BIGINT) AS ta,
             CAST(sum(below) AS BIGINT) AS tb,
             CAST(sum(above + below) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k
      FROM per
    ),
    terms AS (
      SELECT n, k,
             above * n - ta * (above + below) AS da,
             ta * (above + below) * n AS dena,
             below * n - tb * (above + below) AS db,
             tb * (above + below) * n AS denb
      FROM per, tot
    ),
    agg AS (
      SELECT n, k,
             CAST(sum((da * da // dena) * {_MM_Q}
               + (da * da % dena) * {_MM_Q} // dena) AS BIGINT)
               AS qa,
             CAST(sum((db * db // denb) * {_MM_Q}
               + (db * db % denb) * {_MM_Q} // denb) AS BIGINT)
               AS qb
      FROM terms GROUP BY n, k
    )
    SELECT n, k, gm AS grand_med,
           CAST(qa + qb AS BIGINT) AS chi2_q,
           cast(qa + qb as double) / {float(_MM_Q)!r}e0 AS chi2
    FROM agg, med
"""

@gate("mood_median", _MM_SQL)
def q_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("g"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.mood_median(ev, group="g", value="v")
